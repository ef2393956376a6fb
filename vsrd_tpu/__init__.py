"""vsrd_tpu — TPU-native multi-view 3D auto-labeling framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
skmhrk1209/VSRD (volumetric silhouette rendering for weakly-supervised
3D object detection): per-frame test-time optimization of 3D boxes and
residual distance fields against multi-view 2D instance masks, fully
jitted as a `lax.scan` Adam loop, frame-sharded across TPU meshes.
"""

import jax as _jax

# Framework-wide numerics policy: full-precision matmuls by default.
# JAX's default truncates matmul inputs to bf16 (on TPU *and* CPU), which
# at the ~100 m coordinate scale of this workload introduces ~0.4 px ray
# errors and breaks 3D-box parity. Hot kernels that can tolerate bf16
# opt in locally (e.g. the Pallas field kernels accumulate in fp32).
_jax.config.update("jax_default_matmul_precision", "highest")

from . import ops, rendering, models, modules, losses, data, parallel
from . import configuration, utils, visualization, pipeline

__version__ = "0.1.0"
