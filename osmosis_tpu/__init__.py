"""osmosis_tpu — a TPU-native JAX/Flax/Pallas rebuild of the Osmosis
RGBD-diffusion underwater restoration framework.

The upstream capability surface (osmosis-diffusion/osmosis-diffusion-code) is an
inference-only guided-diffusion pipeline: a pretrained 4-in/8-out ADM UNet run
backwards for T steps with DPS-style physics guidance and per-image water
parameter (phi) optimization. This package re-designs that pipeline TPU-first:

* the entire guided step (UNet forward, x0-hat extraction, physics operator,
  joint gradient wrt x_prev and phi, phi optimizer step, guidance update and
  noise injection) compiles into ONE XLA program driven by ``lax.scan``;
* the model is an NHWC Flax UNet with bf16 torso / fp32 GroupNorm islands;
* data-parallel and tensor-parallel execution ride a ``jax.sharding.Mesh``;
* hot attention maps use a fused Pallas TPU kernel.

Layer map mirrors SURVEY.md section 1 of this repo.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax for config-only use)."""
    if name in ("run_restoration", "run_prior_sampling"):
        from . import pipelines

        return getattr(pipelines, name)
    if name in ("UNetModel", "UNetConfig", "unet_config_from_yaml"):
        from . import models

        return getattr(models, name)
    if name in ("make_schedule", "SamplerConfig", "sample_loop"):
        from .diffusion import sampler, schedules

        return getattr(schedules, name, None) or getattr(sampler, name)
    if name in ("GuidanceConfig", "guided_sample_loop"):
        from .diffusion import guided

        return getattr(guided, name)
    raise AttributeError(name)
