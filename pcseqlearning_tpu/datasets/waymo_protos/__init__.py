"""Vendored minimal Waymo Open Dataset protos (see waymo_minimal.proto).

``dataset_pb2``-compatible surface for tools/create_waymo_infos.py when the
waymo-open-dataset pip package is absent: Frame / Laser / RangeImage /
MatrixFloat / MatrixInt32 / LaserCalibration / Label with the public
schema's field numbers, so real TFRecords parse (unknown fields skip).
"""

from . import waymo_minimal_pb2 as dataset_pb2  # noqa: F401

Frame = dataset_pb2.Frame
Label = dataset_pb2.Label
LaserName = dataset_pb2.LaserName
MatrixFloat = dataset_pb2.MatrixFloat
MatrixInt32 = dataset_pb2.MatrixInt32
