from . import raycast, sampling  # noqa: F401
