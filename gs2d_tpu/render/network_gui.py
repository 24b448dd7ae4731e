"""SIBR remote-viewer TCP protocol server.

Wire contract of /root/reference/gaussian_renderer/network_gui.py:27-98:
non-blocking listener; on connect, send the render-items JSON
(length-prefixed); receive length-prefixed JSON camera messages
(resolution, fovs, view / view-projection matrices with the y/z column
sign flips, train & keep_alive flags, scaling modifier, render mode);
reply with raw RGB bytes + the source-path string + a metrics JSON.
"""

from __future__ import annotations

import json
import socket
import struct
from typing import Optional, Tuple

import numpy as np

from ..scene.cameras import Camera


class NetworkGUI:
    def __init__(self):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.conn: Optional[socket.socket] = None
        self.addr = None

    def init(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    def _send_json(self, data):
        payload = json.dumps(data).encode("utf-8")
        self.conn.sendall(struct.pack("I", len(payload)))
        self.conn.sendall(payload)

    def try_connect(self, render_items):
        try:
            self.conn, self.addr = self.listener.accept()
            self.conn.settimeout(None)
            self._send_json(list(render_items))
        except Exception:
            # close a half-accepted socket — dropping the reference
            # without close leaks one fd per failed handshake (EMFILE
            # under repeated probes on a long-running server)
            if self.conn is not None:
                try:
                    self.conn.close()
                except OSError:
                    pass
            self.conn = None

    def _read_msg(self) -> dict:
        header = self._recv_exact(4)
        length = int.from_bytes(header, "little")
        return json.loads(self._recv_exact(length).decode("utf-8"))

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def receive(self) -> Tuple[Optional[Camera], bool, bool, float, int]:
        """Returns (camera, do_training, keep_alive, scaling_modifier,
        render_mode); camera is None on an empty-resolution message."""
        msg = self._read_msg()
        width = msg["resolution_x"]
        height = msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None, None
        wv = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        wv[:, 1] = -wv[:, 1]
        wv[:, 2] = -wv[:, 2]
        fp = np.array(msg["view_projection_matrix"],
                      np.float32).reshape(4, 4)
        fp[:, 1] = -fp[:, 1]
        campos = np.linalg.inv(wv.T)[:3, 3].astype(np.float32)
        cam = Camera(world_view=wv, full_proj=fp, campos=campos,
                     width=int(width), height=int(height),
                     fovx=float(msg["fov_x"]), fovy=float(msg["fov_y"]),
                     znear=float(msg["z_near"]), zfar=float(msg["z_far"]))
        return (cam, bool(msg["train"]), bool(msg["keep_alive"]),
                float(msg["scaling_modifier"]), int(msg["render_mode"]))

    def send(self, image_bytes: Optional[bytes], verify: str,
             metrics: dict):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))
        self._send_json(metrics)

    def disconnect(self):
        if self.conn is not None:
            try:
                self.conn.close()
            finally:
                self.conn = None


def gradient_map(image: np.ndarray) -> np.ndarray:
    """Sobel magnitude (reference utils/image_utils.py:23-33)."""
    from scipy.ndimage import convolve
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 4
    ky = kx.T
    gx = np.stack([convolve(c, kx, mode="constant") for c in image])
    gy = np.stack([convolve(c, ky, mode="constant") for c in image])
    mag = np.sqrt(gx ** 2 + gy ** 2)
    return np.linalg.norm(mag, axis=0, keepdims=True)


def apply_colormap(m: np.ndarray, cmap: str = "turbo") -> np.ndarray:
    import matplotlib.pyplot as plt
    colors = np.asarray(plt.get_cmap(cmap)(np.linspace(0, 1, 256)))[:, :3]
    m = np.asarray(m, np.float32)
    rng = m.max() - m.min()
    m = (m - m.min()) / (rng if rng > 0 else 1.0)
    idx = np.clip((m * 255).round().astype(np.int64), 0, 255).squeeze()
    return colors[idx].transpose(2, 0, 1).astype(np.float32)


def render_net_image(render_pkg: dict, render_items, render_mode: int,
                     camera) -> np.ndarray:
    """Mode dispatch of utils/image_utils.py:41-61; returns (3, H, W)."""
    output = render_items[render_mode].lower()
    if output == "alpha":
        net = np.asarray(render_pkg["rend_alpha"])
    elif output == "normal":
        net = (np.asarray(render_pkg["rend_normal"]) + 1) / 2
    elif output == "depth":
        net = np.asarray(render_pkg["surf_depth"])
    elif output == "edge":
        net = gradient_map(np.asarray(render_pkg["render"]))
    elif output == "curvature":
        net = gradient_map(
            (np.asarray(render_pkg["rend_normal"]) + 1) / 2)
    else:
        net = np.asarray(render_pkg["render"])
    if net.shape[0] == 1:
        net = apply_colormap(net)
    return net
