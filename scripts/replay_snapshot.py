"""Render a replay frame to a PNG exactly the way the browser frontend does.

The image has no browser, so the layered-canvas UI
(src/render/frontend/js/replay.js) cannot be screenshot-tested directly.
This script is the pixel-level equivalent: it starts the native render
server (src/render/replay.cc), speaks the same WebSocket text protocol the
frontend speaks, and draws the reply with the same layer rules —
static obstacles, food, agent bodies in group styles, facing ticks, hp
bars, attack-event crosses, and the minimap inset — then writes a PNG.

Usage:
    python scripts/replay_snapshot.py build/render_battle [--frame 20]
        [--out doc/replay_battle_frame.png] [--cell 12]

Reference UI being mirrored: /root/reference/src/render/frontend/js/
render-handle.js (layered static/body/hp/event canvases + minimap pane).
"""

import argparse
import base64
import hashlib
import json
import os
import re
import socket
import struct
import subprocess
import sys
import time

from PIL import Image, ImageDraw

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RENDER_BIN = os.path.join(REPO, "build", "render", "render")


class WSClient:
    """Minimal RFC6455 client (same as tests/test_render_server.py)."""

    def __init__(self, port, timeout=10):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=timeout)
        self.sock.settimeout(timeout)
        key = base64.b64encode(os.urandom(16)).decode()
        self.sock.sendall(
            ("GET / HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n"
             "Connection: Upgrade\r\nSec-WebSocket-Key: %s\r\n"
             "Sec-WebSocket-Version: 13\r\n\r\n" % key).encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += self.sock.recv(4096)
        accept = base64.b64encode(hashlib.sha1(
            (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()).digest()
        ).decode()
        assert accept.encode() in resp, resp

    def send(self, text):
        payload = text.encode()
        mask = os.urandom(4)
        n = len(payload)
        header = b"\x81"
        if n < 126:
            header += bytes([0x80 | n])
        elif n < 65536:
            header += bytes([0x80 | 126]) + struct.pack(">H", n)
        else:
            header += bytes([0x80 | 127]) + struct.pack(">Q", n)
        self.sock.sendall(header + mask
                          + bytes(b ^ mask[i % 4] for i, b in enumerate(payload)))

    def _read_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("closed")
            buf += chunk
        return buf

    def recv(self):
        out = b""
        while True:
            h = self._read_exact(2)
            ln = h[1] & 0x7F
            if ln == 126:
                ln = struct.unpack(">H", self._read_exact(2))[0]
            elif ln == 127:
                ln = struct.unpack(">Q", self._read_exact(8))[0]
            out += self._read_exact(ln)
            if h[0] & 0x80:
                return out.decode()


def parse_rgba(style):
    m = re.match(r"rgba?\(([\d.]+),\s*([\d.]+),\s*([\d.]+)(?:,\s*([\d.]+))?\)",
                 style or "")
    if not m:
        return (0, 0, 0, 255)
    r, g, b = (int(float(m.group(i))) for i in (1, 2, 3))
    a = int(float(m.group(4) or 1) * 255)
    return (r, g, b, a)


def draw_frame(cfg, body, cell, out_path, origin=(0, 0), ranges=False):
    """Draw one 'f' reply using replay.js's layer rules."""
    ox, oy = origin
    W, H = cfg["width"], cfg["height"]
    img = Image.new("RGB", (W * cell, H * cell), "white")
    dr = ImageDraw.Draw(img, "RGBA")
    tx = lambda x: (x - ox) * cell
    ty = lambda y: (y - oy) * cell

    parts = body.split(";")
    recs = lambda s: s.split("|") if s else []
    events, agents, breads, obstacles = (recs(parts[i]) for i in range(4))
    styles = [parse_rgba(g.get("style")) for g in cfg.get("group", [])]

    # static layer: map border + obstacles
    dr.rectangle([tx(0), ty(0), tx(0) + W * cell - 1, ty(0) + H * cell - 1],
                 outline=(136, 136, 136, 255))
    ob_style = parse_rgba(cfg.get("obstacle-style", "rgba(127,127,127,1)"))
    for o in obstacles:
        x, y = map(float, o.split())
        dr.rectangle([tx(x), ty(y), tx(x) + cell - 1, ty(y) + cell - 1],
                     fill=ob_style)

    # food layer
    for b in breads:
        x, y = map(float, b.split()[:2])
        dr.rectangle([tx(x), ty(y), tx(x) + cell - 1, ty(y) + cell - 1],
                     fill=(210, 180, 80, 255))

    # attack-range sector layer (replay.js sectorPath; below bodies)
    if ranges and cell >= 4:
        for a in agents:
            _id, x, y, group, d, _hp = (int(v) for v in a.split())
            g = cfg.get("group", [{}] * (group + 1))[group]
            w, h = g.get("width", 1), g.get("height", 1)
            if d % 180 != 0:
                w, h = h, w
            r = float(g.get("attack-radius", 1)) * cell
            ang = float(g.get("attack-angle", 360))
            cx = tx(x) + w * cell / 2.0
            cy = ty(y) + h * cell / 2.0
            fill = parse_rgba(g.get("attack-style", "rgba(0,0,0,0.1)"))
            box = [cx - r, cy - r, cx + r, cy + r]
            if ang >= 360:
                dr.ellipse(box, fill=fill)
            else:
                center = d - 90  # canvas angles: 0deg = +x, clockwise
                dr.pieslice(box, center - ang / 2, center + ang / 2, fill=fill)

    # body + facing-tick + hp layers
    dir_tick = {0: (1, 0.5), 90: (0.5, 1), 180: (0, 0.5), 270: (0.5, 0)}
    for a in agents:
        f = [int(v) for v in a.split()]
        _id, x, y, group, d, hp = f
        g = cfg.get("group", [{}] * (group + 1))[group]
        w, h = g.get("width", 1), g.get("height", 1)
        if d % 180 != 0:
            w, h = h, w
        dr.rectangle([tx(x), ty(y), tx(x) + w * cell - 1, ty(y) + h * cell - 1],
                     fill=styles[group] if group < len(styles) else (0, 0, 0, 255))
        if cell >= 6:
            t = dir_tick.get(((d % 360) + 360) % 360, (1, 0.5))
            cx = tx(x) + t[0] * (w * cell) - 2
            cy = ty(y) + t[1] * (h * cell) - 2
            dr.rectangle([cx, cy, cx + 2, cy + 2], fill=(0, 0, 0, 140))
        if cell >= 5:
            dr.rectangle([tx(x), ty(y) - 3, tx(x) + w * cell - 1, ty(y) - 2],
                         fill=(220, 40, 40, 204))
            dr.rectangle([tx(x), ty(y) - 3, tx(x) + (w * cell) * hp / 100, ty(y) - 2],
                         fill=(0, 160, 0, 230))

    # attack-event layer: crosses on target cells
    ev_style = parse_rgba(cfg.get("attack-style", "rgba(63,63,63,0.8)"))
    for e in events:
        _op, _id, x, y = (int(v) for v in e.split())
        dr.line([tx(x), ty(y), tx(x) + cell, ty(y) + cell], fill=ev_style)
        dr.line([tx(x) + cell, ty(y), tx(x), ty(y) + cell], fill=ev_style)

    # minimap inset (packed pixels R<<24|B<<16|G<<8|0xFF, reference quirk)
    mm_w = cfg.get("minimap-width", 300)
    mm_h = cfg.get("minimap-height", 250)
    if len(parts) > 4 and parts[4].strip():
        vals = parts[4].split()
        if len(vals) >= mm_w * mm_h:
            mm = Image.new("RGB", (mm_w, mm_h))
            px = mm.load()
            for i, v in enumerate(vals[: mm_w * mm_h]):
                u = int(v) & 0xFFFFFFFF
                px[i % mm_w, i // mm_w] = (
                    (u >> 24) & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF)
            scale = max(1, (W * cell // 4) // mm_w)
            mm = mm.resize((mm_w * scale, mm_h * scale), Image.NEAREST)
            img.paste(mm, (W * cell - mm.width - 8, H * cell - mm.height - 8))
            dr.rectangle([W * cell - mm.width - 9, H * cell - mm.height - 9,
                          W * cell - 8, H * cell - 8], outline=(85, 85, 85, 255))

    # counts badges (population per group)
    if len(parts) > 5 and parts[5].strip():
        x0 = 6
        for i, n in enumerate(parts[5].split()):
            sw = styles[i] if i < len(styles) else (0, 0, 0, 255)
            dr.rectangle([x0, 6, x0 + 9, 15], fill=sw)
            dr.text((x0 + 13, 5), n, fill=(20, 20, 20, 255))
            x0 += 13 + 8 * len(n) + 10

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    img.save(out_path)
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("replay_dir", help="dir with config.json + video_N.txt")
    ap.add_argument("--video", default=None,
                    help="video file name (default: lowest-numbered "
                         "video_*.txt in the replay dir)")
    ap.add_argument("--frame", type=int, default=None,
                    help="frame index (default: middle frame)")
    ap.add_argument("--out", default="doc/replay_frame.png")
    ap.add_argument("--cell", type=int, default=12)
    ap.add_argument("--port", type=int, default=9535)
    ap.add_argument("--ranges", action="store_true",
                    help="draw attack-range sectors (replay.js 'ranges' box)")
    args = ap.parse_args()

    if not os.path.exists(RENDER_BIN):
        sys.exit("render server not built: cmake -B build -G Ninja && ninja -C build")

    if args.video is None:
        import glob
        vids = sorted(glob.glob(os.path.join(args.replay_dir, "video_*.txt")),
                      key=lambda p: int(re.search(r"video_(\d+)", p).group(1)))
        if not vids:
            sys.exit("no video_*.txt in " + args.replay_dir)
        args.video = os.path.basename(vids[0])

    proc = subprocess.Popen([RENDER_BIN, "--port", str(args.port), "--quiet"])
    try:
        client = None
        for _ in range(50):
            try:
                client = WSClient(args.port)
                break
            except OSError:
                time.sleep(0.1)
        assert client is not None, "could not connect to render server"

        conf_path = os.path.join(args.replay_dir, "config.json")
        client.send("l%s,%s" % (conf_path, args.video))
        info = client.recv()
        assert info[0] == "i", info[:120]
        nframes = int(info[1 : info.index("|")])
        cfg = json.loads(info[info.index("|") + 1 :])
        frame = args.frame if args.frame is not None else nframes // 2

        client.send("p%d 0 0 %d %d" % (frame, cfg["width"], cfg["height"]))
        reply = client.recv()
        assert reply[0] == "f", reply[:120]
        draw_frame(cfg, reply[1:], args.cell, args.out, ranges=args.ranges)
        print("wrote %s (frame %d/%d, %dx%d cells)"
              % (args.out, frame, nframes, cfg["width"], cfg["height"]))
    finally:
        proc.terminate()
        proc.wait(timeout=5)


if __name__ == "__main__":
    main()
