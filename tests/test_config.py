"""Config loading: reference yaml schema + CLI parity."""

import numpy as np

from mc_nerf_tpu.config import Config, build_argparser, from_args, load_yaml

REF_YAML = """
system:
    data:
        seed: 7
    device:
        dev: 'cuda'
    epoch:
        cam_param_stage: 4
        global_opt_stage: 3
        fine_tune_stage: 2
    train_params:
        stage_1_lr: 0.2
        stage_2_lr: 0.001
        stage_3_lr: 0.0005
        weight_decay: 0.0001
        warmup_epoch: 10
        batch: 1234
    test_params:
        nerf_model_name: "weights/train/foo.ckpt"
        resolution_h: 400
        resolution_w: 300
    weights_params:
        root_weights: './w'
    out_params:
        root_out: './r'
        test_enerf_pth: './imgs'
    log_params:
        logpath: './lg'
    tensorboard_params:
        tb_pth: './tb'
        del_mode: True
    apriltag:
        tag_size: 2.0
model:
    barf:
        barf_mask: True
        barf_start: 0.1
        barf_end: 0.9
    nerf:
        near: 2
        far: 6
        samples: 64
        sample_scale: 4
        grid_nerf: 128
        sigma_init: 30.0
        sigma_default: -10.0
        weight_thresh: 0.01
        global_boader_min: -2.0
        global_boader_max: 2.0
        white_back: False
        emb_freqs_xyz: 6
        coarse_MLP_depth: 2
        coarse_MLP_width: 32
        coarse_MLP_skip: [1]
        fine_MLP_depth: 3
        fine_MLP_width: 64
        fine_MLP_skip: [2]
        MLP_deg: 1
"""


def test_load_reference_yaml(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REF_YAML)
    cfg = load_yaml(str(p))
    assert cfg.train.seed == 7
    assert cfg.stages.cam_param_epochs == 4
    assert cfg.stages.total_epochs == 9
    assert cfg.train.stage1_lr == 0.2
    assert cfg.train.rays_per_batch == 1234
    assert cfg.eval.res_h == 400 and cfg.eval.res_w == 300
    assert cfg.eval.demo_ckpt.endswith("foo.ckpt")
    assert cfg.paths.root_weights == "./w"
    assert cfg.paths.tb_delete_old is True
    assert cfg.apriltag_size == 2.0
    assert cfg.barf.mask is True
    assert cfg.nerf.near == 2 and cfg.nerf.far == 6
    assert cfg.nerf.samples_coarse == 64
    assert cfg.nerf.samples_fine_grid == 256
    assert cfg.nerf.coarse_skips == (1,)
    assert cfg.nerf.sh_deg == 1
    assert cfg.nerf.sh_dim == 3 * 4
    assert cfg.nerf.embed_dim == 3 * 13


def test_load_actual_reference_config():
    """The real reference config.yaml must parse with identical values."""
    import os

    ref = "/root/reference/config/config.yaml"
    if not os.path.exists(ref):
        return
    cfg = load_yaml(ref)
    assert cfg.stages.total_epochs == 52
    assert cfg.train.rays_per_batch == 7000
    assert cfg.nerf.samples_coarse == 128
    assert cfg.nerf.sample_scale == 5
    assert cfg.nerf.embed_dim == 63
    assert cfg.nerf.sh_dim == 27


def test_extension_keys_loadable(tmp_path):
    """Every extension knob is settable from YAML (docs/configuration.md)."""
    p = tmp_path / "config.yaml"
    p.write_text(
        """
system:
    train_params:
        fine_mode: 'grid'
        importance_samples: 24
        max_steps_per_program: 100
        prng_impl: 'rbg'
        remat_shade: True
        use_pallas: True
        grad_clip: 5.0
        ckpt_max_keep: 3
    test_params:
        fine_mode: 'grid'
        importance_samples: 48
        rays_per_chunk: 8192
        use_pallas: False
        coarse_free: False
model:
    nerf:
        occ_grid_size: 32
        occ_thresh: 0.02
        occ_decay: 0.9
        occ_update_every: 2
        occ_warmup_steps: 500
        occ_floor: 0.02
        occ_probes: 32
        occ_coarse_samples: 24
        occ_dilate: False
        occ_map_dtype: 'int8'
        coarse_free: True
        occ_pmf: 'density'
        coarse_free_from_stage: 2
        occ_refresh_source: 'fine'
        cf_uniform_samples: 4
        allow_measured_harmful: True
"""
    )
    cfg = load_yaml(str(p))
    assert cfg.train.fine_mode == "grid"
    assert cfg.train.importance_samples == 24
    assert cfg.train.max_steps_per_program == 100
    assert cfg.train.prng_impl == "rbg"
    assert cfg.train.remat_shade is True
    assert cfg.train.use_pallas is True
    assert cfg.train.grad_clip == 5.0
    assert cfg.train.ckpt_max_keep == 3
    assert cfg.eval.fine_mode == "grid"
    assert cfg.eval.importance_samples == 48
    assert cfg.eval.rays_per_chunk == 8192
    assert cfg.eval.use_pallas is False
    assert cfg.nerf.occ_grid_size == 32
    assert cfg.nerf.occ_thresh == 0.02
    assert cfg.nerf.occ_decay == 0.9
    assert cfg.nerf.occ_update_every == 2
    assert cfg.nerf.occ_warmup_steps == 500
    assert cfg.nerf.occ_floor == 0.02
    assert cfg.nerf.occ_probes == 32
    assert cfg.nerf.occ_coarse_samples == 24
    assert cfg.nerf.occ_dilate is False
    assert cfg.nerf.occ_map_dtype == "int8"
    assert cfg.nerf.coarse_free is True
    assert cfg.nerf.occ_pmf == "density"
    assert cfg.nerf.coarse_free_from_stage == 2
    assert cfg.nerf.occ_refresh_source == "fine"
    assert cfg.nerf.cf_uniform_samples == 4
    assert cfg.nerf.allow_measured_harmful is True
    assert cfg.eval.coarse_free is False
    # the eval-side override beats the train-side mode
    assert cfg.eval_coarse_free is False


def test_stage_of_epoch():
    cfg = Config()
    assert cfg.stages.stage_of_epoch(0) == 0
    assert cfg.stages.stage_of_epoch(19) == 0
    assert cfg.stages.stage_of_epoch(20) == 1
    assert cfg.stages.stage_of_epoch(35) == 1
    assert cfg.stages.stage_of_epoch(36) == 2
    assert cfg.stages.stage_of_epoch(51) == 2


def test_barf_global_window_defaults():
    """Default schedule maps to [20/52, 36/52] (ref data_read.py:338-351)."""
    cfg = Config()
    start, end = cfg.barf.global_window(cfg.stages)
    np.testing.assert_allclose(start, 20 / 52)
    np.testing.assert_allclose(end, 36 / 52)


def test_cli_parity(tmp_path):
    parser = build_argparser()
    args = parser.parse_args(
        ["--train", "--root_data", "/d", "--data_name", "Ball_Lego", "--log"]
    )
    cfg = from_args(args)
    assert cfg.mode == 0
    assert cfg.data_root == "/d"
    assert cfg.data_name == "Ball_Lego"
    assert cfg.scene_dir == "/d/Ball_Lego"
    assert cfg.log_to_file is True

    args = parser.parse_args(["--demo"])
    cfg = from_args(args)
    assert cfg.mode == 1
