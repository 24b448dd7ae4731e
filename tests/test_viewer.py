"""SIBR viewer protocol: framing + camera decode over a real socket."""

import json
import socket
import struct
import threading
import time

import numpy as np

from gs2d_tpu.render.network_gui import NetworkGUI, render_net_image


def test_protocol_roundtrip():
    gui = NetworkGUI()
    gui.init("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    result = {}

    def server():
        while gui.conn is None:
            gui.try_connect(["RGB", "Alpha"])
            time.sleep(0.01)
        cam, train, keep, scaling, mode = gui.receive()
        result["cam"] = cam
        result["mode"] = mode
        gui.send(b"\x01\x02\x03", "srcpath", {"#": 7})

    t = threading.Thread(target=server)
    t.start()

    cli = socket.create_connection(("127.0.0.1", port), timeout=5)
    # render items greeting
    n = int.from_bytes(cli.recv(4), "little")
    items = json.loads(cli.recv(n))
    assert items == ["RGB", "Alpha"]

    view = np.eye(4)
    proj = np.eye(4)
    msg = {
        "resolution_x": 64, "resolution_y": 32, "train": True,
        "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": view.flatten().tolist(),
        "view_projection_matrix": proj.flatten().tolist(),
        "render_mode": 1,
    }
    payload = json.dumps(msg).encode()
    cli.sendall(struct.pack("I", len(payload)) + payload)

    img = cli.recv(3)
    assert img == b"\x01\x02\x03"
    n = int.from_bytes(cli.recv(4), "little")
    assert cli.recv(n) == b"srcpath"
    n = int.from_bytes(cli.recv(4), "little")
    metrics = json.loads(cli.recv(n))
    assert metrics == {"#": 7}
    t.join(timeout=5)

    cam = result["cam"]
    assert cam.width == 64 and cam.height == 32
    assert result["mode"] == 1
    # y/z column flips applied
    wv = np.asarray(cam.world_view)
    assert wv[1, 1] == -1 and wv[2, 2] == -1
    cli.close()


def test_render_net_image_modes():
    H, W = 8, 16
    pkg = {
        "render": np.random.rand(3, H, W).astype(np.float32),
        "rend_alpha": np.random.rand(1, H, W).astype(np.float32),
        "rend_normal": np.random.rand(3, H, W).astype(np.float32) * 2 - 1,
        "surf_depth": np.random.rand(1, H, W).astype(np.float32),
    }
    items = ["RGB", "Alpha", "Normal", "Depth", "Edge", "Curvature"]
    for mode in range(len(items)):
        out = render_net_image(pkg, items, mode, None)
        assert out.shape == (3, H, W), items[mode]
