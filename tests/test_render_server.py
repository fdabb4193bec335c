"""End-to-end test of the native WebSocket replay server: dump a replay
with env.render(), start build/render/render, speak RFC6455 + the text
protocol, and check the i/f replies (reference protocol:
src/render/backend/text.cc)."""

import base64
import hashlib
import os
import socket
import struct
import subprocess
import time

import numpy as np
import pytest

import magent_tpu as magent

RENDER_BIN = os.path.join(os.path.dirname(__file__), "..", "build", "render", "render")


class MiniWSClient:
    def __init__(self, port, timeout=10):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=timeout)
        self.sock.settimeout(timeout)
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            "GET / HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n"
            "Connection: Upgrade\r\nSec-WebSocket-Key: %s\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n" % key
        )
        self.sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += self.sock.recv(4096)
        accept = base64.b64encode(
            hashlib.sha1(
                (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
            ).digest()
        ).decode()
        assert accept.encode() in resp, resp

    def send(self, text):
        payload = text.encode()
        mask = os.urandom(4)
        header = b"\x81"
        n = len(payload)
        if n < 126:
            header += bytes([0x80 | n])
        elif n < 65536:
            header += bytes([0x80 | 126]) + struct.pack(">H", n)
        else:
            header += bytes([0x80 | 127]) + struct.pack(">Q", n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        self.sock.sendall(header + mask + masked)

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
            fin = h[0] & 0x80
            ln = h[1] & 0x7F
            if ln == 126:
                ln = struct.unpack(">H", self._read_exact(2))[0]
            elif ln == 127:
                ln = struct.unpack(">Q", self._read_exact(8))[0]
            out += self._read_exact(ln)
            if fin:
                return out.decode()

    def close(self):
        self.sock.close()


@pytest.fixture
def replay_dir(tmp_path):
    env = magent.GridWorld("battle", map_size=16)
    h0, h1 = env.get_handles()
    env.set_render_dir(str(tmp_path))
    env.reset()
    env.add_agents(h0, method="custom", pos=[[3, 3], [5, 5]])
    env.add_agents(h1, method="custom", pos=[[10, 10], [12, 12]])
    rng = np.random.RandomState(0)
    for _ in range(3):
        for h in (h0, h1):
            env.set_action(h, rng.randint(
                0, env.get_action_space(h)[0], env.get_num(h)).astype(np.int32))
        env.step()
        env.render()
        env.clear_dead()
    return tmp_path


@pytest.mark.skipif(not os.path.exists(RENDER_BIN),
                    reason="native render server not built (cmake+ninja)")
def test_render_server_roundtrip(replay_dir):
    port = 9531
    proc = subprocess.Popen([RENDER_BIN, "--port", str(port), "--quiet"])
    try:
        client = None
        for _ in range(50):
            try:
                client = MiniWSClient(port)
                break
            except OSError:
                time.sleep(0.1)
        assert client is not None, "could not connect to render server"

        client.send("l%s,%s" % (replay_dir / "config.json", "video_1.txt"))
        reply = client.recv()
        assert reply[0] == "i", reply[:80]
        nframes = int(reply[1:reply.index("|")])
        assert nframes == 3
        assert '"width": 16' in reply

        client.send("p0 0 0 16 16")
        reply = client.recv()
        assert reply[0] == "f", reply[:80]
        sections = reply[1:].split(";")
        assert len(sections) == 6
        agents = sections[1].split("|")
        assert len(agents) == 4  # 2 + 2 agents visible
        assert all(len(a.split()) == 6 for a in agents)
        obstacles = sections[3].split("|")
        assert len(obstacles) == 4 * 16 - 4  # border walls
        counts = sections[5].split()
        assert counts == ["2", "2"]

        # out-of-range and garbage are error replies, not disconnects
        client.send("p99 0 0 16 16")
        assert client.recv()[0] == "e"
        client.send("zzz")
        assert client.recv()[0] == "e"
        client.close()
    finally:
        proc.terminate()
        proc.wait(timeout=5)


@pytest.mark.skipif(not os.path.exists(RENDER_BIN),
                    reason="native render server not built (cmake+ninja)")
def test_frontend_frame_contract(replay_dir):
    """Decode a frame exactly the way the frontend's layered UI does
    (src/render/frontend/js/replay.js): minimap pixels, group counts, agent
    hp/dir fields — the headless equivalent of a browser screenshot check."""
    port = 9532
    proc = subprocess.Popen([RENDER_BIN, "--port", str(port), "--quiet"])
    try:
        client = None
        for _ in range(50):
            try:
                client = MiniWSClient(port)
                break
            except OSError:
                time.sleep(0.1)
        assert client is not None

        client.send("l%s,%s" % (replay_dir / "config.json", "video_1.txt"))
        info = client.recv()
        import json
        cfg = json.loads(info[info.index("|") + 1:])
        mm_w = cfg.get("minimap-width", 300)
        mm_h = cfg.get("minimap-height", 250)
        styles = [g["style"] for g in cfg["group"]]
        assert len(styles) == 2 and all(s.startswith("rgba(") for s in styles)

        client.send("p0 0 0 16 16")
        sections = client.recv()[1:].split(";")

        # agents: "id x y group dir hp" with hp in [0, 100], dir in degrees
        for rec in sections[1].split("|"):
            _id, x, y, group, direction, hp = map(int, rec.split())
            assert 0 <= x < 16 and 0 <= y < 16
            assert group in (0, 1)
            assert direction in (0, 90, 180, 270)
            assert 0 <= hp <= 100

        # minimap: mm_w * mm_h packed pixels R<<24|B<<16|G<<8|0xFF; agent
        # cells must be non-white and mix the group styles
        pix = [int(v) & 0xFFFFFFFF for v in sections[4].split()]
        assert len(pix) == mm_w * mm_h
        non_white = [v for v in pix if v != 0xFFFFFFFF]
        assert len(non_white) == 4  # four live agents, distinct cells
        reds = {(v >> 24) & 0xFF for v in non_white}
        assert len(reds) >= 2  # both group colors appear

        # counts line drives the population badges
        assert sections[5].split() == ["2", "2"]
        client.close()
    finally:
        proc.terminate()
        proc.wait(timeout=5)


@pytest.mark.skipif(not os.path.exists(RENDER_BIN),
                    reason="native render server not built (cmake+ninja)")
def test_render_server_serves_snake_replay(tmp_path):
    """The native server replays DiscreteSnake dumps (3 style groups,
    static.map walls) end to end."""
    from magent_tpu.discrete_snake import Config, DiscreteSnake, ACT_NOOP

    cfg = Config()
    cfg.set(dict(map_width=20, map_height=20, total_resource=20, seed=9))
    env = DiscreteSnake(cfg, caps=8, max_length=12)
    env.add_food(method="random", n=10)
    env.add_agent(method="random", n=3)
    env.set_render_dir(str(tmp_path))
    for _ in range(2):
        env.set_action(0, np.full(env.get_num(), ACT_NOOP, np.int32))
        env.step()
        env.render()
        env.clear_dead()

    port = 9533
    proc = subprocess.Popen([RENDER_BIN, "--port", str(port), "--quiet"])
    try:
        client = None
        for _ in range(50):
            try:
                client = MiniWSClient(port)
                break
            except OSError:
                time.sleep(0.1)
        assert client is not None

        client.send("l%s,%s" % (tmp_path / "config.json", "video_0.txt"))
        info = client.recv()
        assert info[0] == "i", info[:120]
        assert int(info[1:info.index("|")]) == 2
        client.send("p0 0 0 20 20")
        reply = client.recv()
        assert reply[0] == "f", reply[:120]
        sections = reply[1:].split(";")
        ents = sections[1].split("|")
        groups = {int(e.split()[3]) for e in ents}
        assert groups <= {0, 1, 2} and 1 in groups  # food + snake parts
        client.close()
    finally:
        proc.terminate()
        proc.wait(timeout=5)
