from lightglue_tpu.pipeline.extract import Extraction, extract_keypoints
from lightglue_tpu.pipeline.match import Matches, filter_matches

__all__ = ["Extraction", "extract_keypoints", "Matches", "filter_matches"]
