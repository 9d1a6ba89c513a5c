"""TPU kernel layer.

Each module replaces one of the reference's CUDA extensions
(/root/reference/setup.py:62-172) with XLA-native / Pallas implementations:

  segment_ops           torch_scatter (scatter/segment_coo) equivalents
  grid_utils            torch_cluster.grid_cluster / GridSampling3D / dynamic voxelization
  hash_graph            torch_hash (hash_insert_gpu / radius_graph_gpu / correspondence)
  connected_components  scipy.sparse.csgraph.connected_components (on-device)
  geometry              svd3_cuda_device.h (3x3 eigh/SVD), weighted Procrustes
  boxes                 roiaware_pool3d points_in_boxes, iou3d_nms
  sampling              pointnet2 furthest-point sampling
  sparse_conv           spconv gather-GEMM-scatter sparse convolution
"""
