from .numeric import dec_avg, dec_sum, dec_sum_window
from .cleaning import clean_string, coalesce_unknown, try_double
from .keys import sha_key

__all__ = [
    "dec_avg",
    "dec_sum",
    "dec_sum_window",
    "clean_string",
    "coalesce_unknown",
    "try_double",
    "sha_key",
]
