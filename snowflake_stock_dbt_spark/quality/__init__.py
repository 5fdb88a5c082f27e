from .checks import (
    CheckResult,
    accepted_range,
    not_null,
    relationships,
    run_checks,
    unique,
)

__all__ = [
    "CheckResult",
    "accepted_range",
    "not_null",
    "relationships",
    "run_checks",
    "unique",
]
