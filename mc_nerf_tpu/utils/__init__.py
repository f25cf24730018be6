"""Runtime utilities: logging, precision, tensorboard, visualization."""
