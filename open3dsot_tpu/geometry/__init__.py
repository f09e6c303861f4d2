from open3dsot_tpu.geometry.quaternion import Quaternion
from open3dsot_tpu.geometry.data_classes import Box, PointCloud

__all__ = ["Quaternion", "Box", "PointCloud"]
