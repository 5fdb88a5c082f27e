from .filters import apply_filters, distinct_options, insights, liquidity_shocks

__all__ = ["apply_filters", "distinct_options", "insights", "liquidity_shocks"]
