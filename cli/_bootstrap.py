"""Put the repo root on sys.path so `import fastdet` works from cli/,
and honor JAX_PLATFORMS even under platform plugins that ignore the
env var (the axon TPU plugin registers itself regardless — observed
picking the TPU with JAX_PLATFORMS=cpu set, which broke CPU-pinned
subprocess tests)."""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
