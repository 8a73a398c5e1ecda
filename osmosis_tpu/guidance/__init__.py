from .operators import get_operator, convert_depth  # noqa: F401
from .noise import get_noiser  # noqa: F401
from .losses import make_aux_loss_fn  # noqa: F401
from .schedule_masks import pattern_masks  # noqa: F401
