from .dedup import latest_wins
from .upsert import merge_upsert
from .zscore import zscore_outliers

__all__ = ["latest_wins", "merge_upsert", "zscore_outliers"]
