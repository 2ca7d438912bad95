"""disprcnn_tpu: a TPU-native (JAX/XLA/Pallas) stereo 3D object detection framework
with the capabilities of zju3dv/disprcnn (Disp R-CNN, CVPR 2020 / T-PAMI 2021)."""

__version__ = "0.1.0"
