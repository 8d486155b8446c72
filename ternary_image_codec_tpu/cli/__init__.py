"""Command-line tools (reference parity: src/t3dump.cpp, src/t3proto_tool.cpp,
src/main_bare.cpp).  Each module is runnable via
`python -m ternary_image_codec_tpu.cli.<tool>`."""
import os

# This environment pre-imports jax with a force-registered TPU backend that
# ignores the JAX_PLATFORMS env var; honor an explicit CPU request here so
# the host tools work even when the TPU tunnel is busy or absent.
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - backend already initialized
        pass
