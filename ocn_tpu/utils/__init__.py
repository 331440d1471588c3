import os


def force_platform(platform: str) -> None:
    """Select a JAX backend robustly in this build image.

    The image's sitecustomize registers the axon TPU plugin and pins
    JAX_PLATFORMS=axon in os.environ at interpreter start, so environment
    variables are ineffective; only jax.config works (must run before any
    backend initialization)."""
    import jax

    jax.config.update("jax_platforms", platform)
