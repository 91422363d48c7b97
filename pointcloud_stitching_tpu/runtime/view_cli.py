"""Live viewer: subscribe to a stitched-cloud stream and render it.

The consumer half of the visualization story (reference: the client's
``pcl::visualization::PCLVisualizer`` window in its render loop —
src/pcs-multicamera-client.cpp, SURVEY.md §1 L4). `CloudPublisher` pushes
every fused cloud over TCP (POINTS_I16MM); this tool connects, renders each
frame as a depth-buffered orthographic projection and shows it live:

  * in a cv2 window when a GUI is available (the default; falls back
    cleanly when cv2/imshow is absent or headless — `--no-window` forces
    the fallback),
  * otherwise as a rolling image sequence on disk (`--out-dir`, PNG via cv2
    or zero-dependency PPM) — `frame_%05d` plus a continuously-overwritten
    `latest`, so `watch`/a browser tab/an http.server on the directory acts
    as the live monitor on a GUI-less serving box.

Projection bounds lock onto the first frame (expanding only when the cloud
outgrows them) so the view doesn't rescale every frame.

CLI:
  python -m pointcloud_stitching_tpu.runtime.view_cli \
      --connect HOST:PORT [--axis z] [--size 800] [--out-dir viewer_out] \
      [--frames N] [--every K] [--window]
"""
from __future__ import annotations

import argparse
import os
import socket
import time
from typing import Callable, Optional

import numpy as np

from ..io.render import render_orthographic, save_image
from .wire import Kind, recv_frame


class StreamViewer:
    """Pull frames from a publisher connection and render them.

    ``sink(frame_index, image)`` receives every rendered [size,size,3]
    uint8 image; the CLI wires it to a cv2 window or the image-sequence
    writer. Separated from the CLI so tests can drive the full
    subscribe→decode→render path headlessly.
    """

    def __init__(self, address: tuple[str, int], axis: str = "z",
                 size: int = 800, every: int = 1,
                 connect_timeout: float = 10.0):
        self.address = address
        self.axis = axis
        self.size = size
        self.every = max(every, 1)
        self._timeout = connect_timeout
        # sticky projection window: lock to the first frame, expand only
        self._lo: Optional[np.ndarray] = None
        self._span: float = 0.0
        self.frames_rendered = 0

    def _update_bounds(self, xyz: np.ndarray) -> tuple[np.ndarray, float]:
        from ..io.picker import projection_bounds
        lo, span = projection_bounds(xyz, axis=self.axis)
        if self._lo is None:
            self._lo, self._span = lo, span
        else:
            # expand (never shrink): keeps the view stable while following
            # a scene that grows past the initial window
            new_lo = np.minimum(self._lo, lo)
            new_hi = np.maximum(self._lo + self._span, lo + span)
            self._lo = new_lo
            self._span = float((new_hi - new_lo).max())
        return self._lo, self._span

    def run(self, sink: Callable[[int, np.ndarray], bool],
            num_frames: Optional[int] = None) -> int:
        """Stream until the publisher closes, num_frames rendered, or the
        sink returns False. Returns frames rendered."""
        sock = socket.create_connection(self.address, timeout=self._timeout)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        sock.settimeout(30.0)
        n_seen = 0
        try:
            while num_frames is None or self.frames_rendered < num_frames:
                try:
                    kind, seq, payload = recv_frame(sock)
                except (ConnectionError, OSError, EOFError):
                    break
                if kind != Kind.POINTS_I16MM:
                    continue
                n_seen += 1
                if (n_seen - 1) % self.every:
                    continue
                xyz, rgb = payload
                if len(xyz) == 0:
                    continue
                bounds = self._update_bounds(xyz)
                img = render_orthographic(xyz, rgb, axis=self.axis,
                                          size=self.size, bounds=bounds)
                idx = self.frames_rendered
                self.frames_rendered += 1
                if not sink(idx, img):
                    break
        finally:
            try:
                sock.close()
            except OSError:
                pass
        return self.frames_rendered


def _window_sink(title: str = "pointcloud_stitching_tpu"):
    """cv2 window sink, or None when no GUI backend works."""
    try:
        import cv2
        test = np.zeros((2, 2, 3), np.uint8)
        cv2.imshow(title, test)
        cv2.waitKey(1)
    except Exception:
        return None

    def sink(idx: int, img: np.ndarray) -> bool:
        cv2.imshow(title, img[..., ::-1])  # cv2 is BGR
        return (cv2.waitKey(1) & 0xFF) != ord("q")

    return sink


def _directory_sink(out_dir: str, keep: int = 0):
    """Image-sequence sink: frame_%05d + an atomically-replaced `latest`."""
    os.makedirs(out_dir, exist_ok=True)
    try:
        import cv2  # noqa: F401
        ext = ".png"
    except ImportError:
        ext = ".ppm"
    t0 = time.time()

    def sink(idx: int, img: np.ndarray) -> bool:
        save_image(os.path.join(out_dir, f"frame_{idx:05d}{ext}"), img)
        tmp = os.path.join(out_dir, f".latest_tmp{ext}")
        save_image(tmp, img)
        os.replace(tmp, os.path.join(out_dir, f"latest{ext}"))
        if keep and idx >= keep:
            old = os.path.join(out_dir, f"frame_{idx - keep:05d}{ext}")
            if os.path.exists(old):
                os.remove(old)
        if idx and idx % 30 == 0:
            fps = (idx + 1) / max(time.time() - t0, 1e-9)
            print(f"viewer: {idx + 1} frames, {fps:.1f} FPS -> {out_dir}",
                  flush=True)
        return True

    return sink


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--connect", required=True, metavar="HOST:PORT",
                    help="publisher address (stitch_cli --publish-port)")
    ap.add_argument("--axis", default="z", choices=("x", "y", "z"))
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--frames", type=int, default=None,
                    help="stop after N rendered frames (default: forever)")
    ap.add_argument("--every", type=int, default=1,
                    help="render every K-th frame")
    ap.add_argument("--out-dir", default="viewer_out")
    ap.add_argument("--keep", type=int, default=300,
                    help="rolling image-sequence length (0 = keep all)")
    ap.add_argument("--window", dest="window", action="store_true",
                    default=None,
                    help="force a cv2 GUI window (default: try one, fall "
                         "back to the image sequence when headless)")
    ap.add_argument("--no-window", dest="window", action="store_false",
                    help="always write the image sequence")
    args = ap.parse_args(argv)

    host, port = args.connect.rsplit(":", 1)
    # default (no flag): try a window, fall back — matches the README's
    # "cv2 window when a GUI exists; otherwise a rolling image sequence"
    sink = _window_sink() if args.window is not False else None
    if sink is None:
        if args.window:
            print("viewer: no GUI available, writing image sequence",
                  flush=True)
        sink = _directory_sink(args.out_dir, keep=args.keep)

    viewer = StreamViewer((host, int(port)), axis=args.axis, size=args.size,
                          every=args.every)
    n = viewer.run(sink, num_frames=args.frames)
    print(f"viewer: rendered {n} frames", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
