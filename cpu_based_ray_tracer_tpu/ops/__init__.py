"""Compute kernels: vector math, intersection, sampling, BVH, denoise, Pallas."""
