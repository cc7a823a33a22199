from stylex_tpu.eval.fid import fid_from_image_batches, frechet_distance, FeatureStats

__all__ = ["fid_from_image_batches", "frechet_distance", "FeatureStats"]
