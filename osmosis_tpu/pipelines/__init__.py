from .restore import run_restoration  # noqa: F401
from .prior import run_prior_sampling  # noqa: F401
