"""Ahead-of-time build entry: python -m pointcloud_stitching_tpu.native.build"""
from . import build

if __name__ == "__main__":
    print(build(force=True))
