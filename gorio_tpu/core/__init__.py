from . import gp, lie, pointcloud  # noqa: F401
