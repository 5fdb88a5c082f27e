from .layout import write_bucketed_table, write_partitioned

__all__ = ["write_bucketed_table", "write_partitioned"]
