"""Pallas/Mosaic TPU kernels — the native compute tier of the framework
(the reference's equivalent layer is cuDNN/cuBLAS via torch, SURVEY §2.3).

Each kernel ships with an XLA reference implementation and a parity test;
callers dispatch to Pallas on TPU and fall back to XLA elsewhere.
"""
