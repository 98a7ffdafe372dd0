from . import linalg, quat, se3, so3  # noqa: F401
