"""lif_tpu: a TPU-native (JAX/XLA/Pallas) light-field-image view-synthesis
framework.

Re-creation of the capabilities of the LIF-renderer reference library
(THREE.js/WebGL) as pure jit-compiled functions of
(scene arrays, camera) -> image, vmapped over layers/views/frames and
sharded over TPU meshes.

Public surface mirrors the reference's exports (reference: src/index.ts:4-19).
"""

__version__ = "0.1.0"

from .core.camera import Camera  # noqa: F401
from .core.pose import (  # noqa: F401
    lif_rotation_to_matrix,
    lif_rotation_to_quaternion,
    orbit_pose,
)
