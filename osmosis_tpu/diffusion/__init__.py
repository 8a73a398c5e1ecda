from .schedules import (  # noqa: F401
    DiffusionSchedule,
    get_named_beta_schedule,
    make_schedule,
    space_timesteps,
)
