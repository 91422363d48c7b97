#!/usr/bin/env python
"""Shim: the implementation lives in pointcloud_stitching_tpu.tools
(graph_cli) so installed wheels ship it; this path keeps the
`python registration/graph_cli.py` invocation working from a checkout."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointcloud_stitching_tpu.tools.graph_cli import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
