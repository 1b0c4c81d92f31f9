"""Live progressive-accumulation preview over HTTP (VERDICT r3 #8).

The reference is an on-screen app: you WATCH the accumulation converge
in an SFML window at up to max_fps (src/main.cpp:79-106,
src/windows/windows.cpp:24-47). The TPU-native host is headless, so the
presentation layer streams instead: `PreviewServer` serves

  /            a tiny HTML page showing the live stream(s), one <img>
               per window, placed with the window_layout proportions
  /stream?view=yxz
               a multipart/x-mixed-replace stream of PNG frames (the
               MJPEG pattern with lossless parts — every mainstream
               browser renders it) at up to ``fps`` parts/second
  /frame.png?view=yxz
               the current frame once (curl-able)

The server owns NOTHING: it pulls frames through a ``get_frame(view)``
callback supplied by the app (which applies the upscale sprite blit and
the capture-gated FPS overlay exactly like the PNG path), so the render
loop stays single-threaded and the stream just observes the newest
accumulation buffer. Frames are encoded per-connection at
compress_level 1 — on a localhost stream encode speed beats size.

stdlib-only (http.server + threading): nothing to install, works
through an SSH port-forward to the TPU host.
"""
from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Sequence
from urllib.parse import parse_qs, urlparse

import numpy as np

from fourd_ray_tracing_tpu.utils.image import encode_png

_PAGE = """<!doctype html>
<html><head><title>fourd_ray_tracing_tpu</title>
<style>body{{background:#111;color:#ddd;font:14px monospace;text-align:center}}
img{{image-rendering:pixelated;margin:6px;border:1px solid #333}}</style>
</head><body><h3>fourd_ray_tracing_tpu &mdash; live accumulation</h3>
{imgs}
<p>progressive mean while the camera is still; resets on motion
(main.cpp:87, controls.cpp:132)</p></body></html>"""


class PreviewServer:
    """Threaded HTTP preview. ``get_frame(view) -> (H, W, 3) uint8`` is
    called from server threads; it must be cheap and lock-free (snapshot
    the newest buffer, never block the render loop)."""

    def __init__(
        self,
        get_frame: Callable[[str], np.ndarray],
        views: Sequence[str] = ("yxz",),
        host: str = "127.0.0.1",
        port: int = 0,
        fps: float = 10.0,
    ):
        self._get_frame = get_frame
        self.views = tuple(views)
        self.fps = float(fps)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _view(self) -> str:
                q = parse_qs(urlparse(self.path).query)
                v = q.get("view", [outer.views[0]])[0]
                return v if v in outer.views else outer.views[0]

            def do_GET(self):  # noqa: N802 (stdlib API name)
                path = urlparse(self.path).path
                if path == "/":
                    imgs = "".join(
                        f'<img src="/stream?view={v}" alt="{v}" title="{v}">'
                        for v in outer.views
                    )
                    body = _PAGE.format(imgs=imgs).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif path == "/frame.png":
                    data = encode_png(outer._get_frame(self._view()),
                                      compress_level=1)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(data)))
                    self.send_header("Cache-Control", "no-store")
                    self.end_headers()
                    self.wfile.write(data)
                elif path == "/stream":
                    view = self._view()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame",
                    )
                    self.end_headers()
                    delay = 1.0 / max(outer.fps, 0.1)
                    try:
                        while not outer._closed:
                            data = encode_png(outer._get_frame(view),
                                              compress_level=1)
                            self.wfile.write(
                                b"--frame\r\nContent-Type: image/png\r\n"
                                + f"Content-Length: {len(data)}\r\n\r\n".encode()
                            )
                            self.wfile.write(data)
                            self.wfile.write(b"\r\n")
                            self.wfile.flush()
                            time.sleep(delay)
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                else:
                    self.send_error(404)

        self._closed = False
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}/"

    def close(self) -> None:
        self._closed = True
        self._httpd.shutdown()
        self._httpd.server_close()
