from mst_tpu.augment.chain import AugmentConfig, augment_stems

__all__ = ["AugmentConfig", "augment_stems"]
