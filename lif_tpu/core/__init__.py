from . import camera, color, pose, transforms  # noqa: F401
