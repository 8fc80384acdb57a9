"""Device-side numeric ops: audio frontend, ZMUV, augmentation, losses."""
