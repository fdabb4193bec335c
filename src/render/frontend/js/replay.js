// Layered canvas replay client for the magent_tpu render server
// (capability parity with the reference's pixi UI,
// reference: src/render/frontend/js/render-handle.js — layered static /
// body / hp / event canvases, minimap pane, frame navigation).
//
// Speaks the text protocol of src/render/replay.cc:
//   send "l<config>,<video>"                    recv "i<n>|<config json>"
//   send "p<frame> <xmin> <ymin> <xmax> <ymax>" recv "f<ev>;<ag>;<br>;<ob>;<mm>;<ct>"
"use strict";

const WS_URL = "ws://" + (location.hostname || "localhost") + ":9030";

const cv = document.getElementById("cv");
const ctx = cv.getContext("2d");
const cvStatic = document.getElementById("cvStatic");
const sctx = cvStatic.getContext("2d");
const mmCv = document.getElementById("minimap");
const mmCtx = mmCv.getContext("2d");
const statusEl = document.getElementById("status");
const countsEl = document.getElementById("counts");
const scrub = document.getElementById("scrub");

let ws = null;
let config = null;       // parsed config.json
let nFrames = 0;
let frame = 0;
let playing = false;
let fps = 10;
let cell = 6;            // pixels per map cell
let originX = 0, originY = 0;  // pan (map cells)
let groupStyles = [];
let mmW = 300, mmH = 250;

function resize() {
  const h = window.innerHeight - document.getElementById("bar").offsetHeight;
  for (const c of [cv, cvStatic]) {
    c.width = window.innerWidth;
    c.height = h;
  }
}
window.addEventListener("resize", () => { resize(); requestFrame(); });
resize();

function connect() {
  ws = new WebSocket(WS_URL);
  ws.onopen = () => { statusEl.textContent = "connected " + WS_URL; };
  ws.onclose = () => { statusEl.textContent = "disconnected"; };
  ws.onerror = () => { statusEl.textContent = "error connecting " + WS_URL; };
  ws.onmessage = (ev) => handleMessage(ev.data);
}
connect();

function handleMessage(data) {
  const tag = data[0];
  const body = data.slice(1);
  if (tag === "e") {
    statusEl.textContent = "server error: " + body;
  } else if (tag === "i") {
    const sep = body.indexOf("|");
    nFrames = parseInt(body.slice(0, sep));
    config = JSON.parse(body.slice(sep + 1));
    groupStyles = (config.group || []).map(g => g.style || "rgba(0,0,0,1)");
    mmW = config["minimap-width"] || 300;
    mmH = config["minimap-height"] || 250;
    mmCv.width = mmW; mmCv.height = mmH;
    document.getElementById("nframes").textContent = nFrames;
    scrub.max = Math.max(nFrames - 1, 0);
    frame = 0;
    requestFrame();
  } else if (tag === "f") {
    drawFrame(body);
  }
}

function requestFrame() {
  if (!ws || ws.readyState !== 1 || !config) return;
  const xmin = Math.floor(originX), ymin = Math.floor(originY);
  const xmax = Math.ceil(originX + cv.width / cell);
  const ymax = Math.ceil(originY + cv.height / cell);
  ws.send("p" + frame + " " + xmin + " " + ymin + " " + xmax + " " + ymax);
  document.getElementById("frameno").textContent = frame;
  scrub.value = frame;
}

function splitRecords(section) {
  return section.length ? section.split("|") : [];
}

function drawStatic(obstacles) {
  sctx.clearRect(0, 0, cvStatic.width, cvStatic.height);
  sctx.strokeStyle = "#888";
  sctx.strokeRect(toX(0), toY(0), config.width * cell, config.height * cell);
  sctx.fillStyle = config["obstacle-style"] || "rgba(127,127,127,1)";
  for (const o of obstacles) {
    const [x, y] = o.split(" ").map(Number);
    sctx.fillRect(toX(x), toY(y), cell, cell);
  }
}

function drawMinimap(mmSection) {
  // packed pixels R<<24|B<<16|G<<8|0xFF (reference layout quirk)
  if (!mmSection || !mmSection.length) return;
  const vals = mmSection.split(" ");
  if (vals.length < mmW * mmH) return;
  const img = mmCtx.createImageData(mmW, mmH);
  for (let i = 0; i < mmW * mmH; i++) {
    const v = Number(vals[i]) >>> 0;
    img.data[4 * i + 0] = (v >>> 24) & 0xff;       // R
    img.data[4 * i + 1] = (v >>> 8) & 0xff;        // G
    img.data[4 * i + 2] = (v >>> 16) & 0xff;       // B
    img.data[4 * i + 3] = 255;
  }
  mmCtx.putImageData(img, 0, 0);
  // viewport rectangle
  mmCtx.strokeStyle = "rgba(0,0,0,0.9)";
  mmCtx.strokeRect(
    originX / config.width * mmW,
    originY / config.height * mmH,
    (cv.width / cell) / config.width * mmW,
    (cv.height / cell) / config.height * mmH);
}

function drawCounts(ctSection) {
  if (!ctSection) return;
  const counts = ctSection.split(" ").map(Number);
  let html = "";
  counts.forEach((n, i) => {
    html += '<span class="sw" style="background:' +
      (groupStyles[i] || "#000") + '"></span>' + n;
  });
  countsEl.innerHTML = html;
}

const DIR_TICK = { 0: [1, 0.5], 90: [0.5, 1], 180: [0, 0.5], 270: [0.5, 0] };

function drawFrame(body) {
  const parts = body.split(";");
  const events = splitRecords(parts[0]);
  const agents = splitRecords(parts[1]);
  const breads = splitRecords(parts[2]);
  const obstacles = splitRecords(parts[3]);

  drawStatic(obstacles);
  drawMinimap(parts[4]);
  drawCounts(parts[5]);

  ctx.clearRect(0, 0, cv.width, cv.height);

  // food
  ctx.fillStyle = "rgba(210,180,80,1)";
  for (const b of breads) {
    const [x, y] = b.split(" ").map(Number);
    ctx.fillRect(toX(x), toY(y), cell, cell);
  }

  // agent bodies + hp bars + facing ticks
  for (const a of agents) {
    const f = a.split(" ").map(Number);
    const [id, x, y, group, dir, hp] = f;
    const style = config.group && config.group[group];
    let w = style ? style.width : 1, h = style ? style.height : 1;
    if (dir % 180 !== 0) { const t = w; w = h; h = t; }
    ctx.fillStyle = groupStyles[group] || "rgba(0,0,0,1)";
    ctx.fillRect(toX(x), toY(y), w * cell, h * cell);
    if (cell >= 6) {
      const t = DIR_TICK[((dir % 360) + 360) % 360] || [1, 0.5];
      ctx.fillStyle = "rgba(0,0,0,0.55)";
      ctx.fillRect(toX(x) + t[0] * (w * cell) - 2,
                   toY(y) + t[1] * (h * cell) - 2, 3, 3);
    }
    if (cell >= 5) {  // hp layer
      ctx.fillStyle = "rgba(220,40,40,0.8)";
      ctx.fillRect(toX(x), toY(y) - 3, w * cell, 2);
      ctx.fillStyle = "rgba(0,160,0,0.9)";
      ctx.fillRect(toX(x), toY(y) - 3, (w * cell) * hp / 100, 2);
    }
  }

  // attack events: "type id x y" — cross on the target cell
  ctx.strokeStyle = config["attack-style"] || "rgba(63,63,63,0.8)";
  for (const e of events) {
    const [type, id, x, y] = e.split(" ").map(Number);
    const cx = toX(x), cy = toY(y);
    ctx.beginPath();
    ctx.moveTo(cx, cy); ctx.lineTo(cx + cell, cy + cell);
    ctx.moveTo(cx + cell, cy); ctx.lineTo(cx, cy + cell);
    ctx.stroke();
  }
}

function toX(x) { return (x - originX) * cell; }
function toY(y) { return (y - originY) * cell; }

document.getElementById("load").onclick = () => {
  const conf = document.getElementById("conf").value;
  const file = document.getElementById("file").value;
  ws.send("l" + conf + "," + file);
};

const playBtn = document.getElementById("play");
playBtn.onclick = () => {
  playing = !playing;
  playBtn.textContent = playing ? "pause" : "play";
};

scrub.addEventListener("input", () => {
  frame = Number(scrub.value);
  requestFrame();
});

setInterval(() => {
  if (playing && nFrames > 0) {
    frame = (frame + 1) % nFrames;
    requestFrame();
  }
}, 1000 / fps);

window.addEventListener("keydown", (e) => {
  if (e.target.tagName === "INPUT" && e.target.type === "text") return;
  if (e.key === "ArrowRight") { frame = nFrames ? Math.min(frame + 1, nFrames - 1) : 0; }
  else if (e.key === "ArrowLeft") { frame = Math.max(frame - 1, 0); }
  else if (e.key === " ") { playBtn.onclick(); e.preventDefault(); return; }
  else if (e.key === "+" || e.key === "=") { fps = Math.min(fps * 2, 80); return; }
  else if (e.key === "-") { fps = Math.max(fps / 2, 1); return; }
  else if (e.key === "]") { cell = Math.min(cell + 1, 40); }
  else if (e.key === "[") { cell = Math.max(cell - 1, 1); }
  else if (e.key === "w") { originY -= 5; }
  else if (e.key === "s") { originY += 5; }
  else if (e.key === "a") { originX -= 5; }
  else if (e.key === "d") { originX += 5; }
  else return;
  requestFrame();
});

let dragging = false, lastX = 0, lastY = 0;
cv.addEventListener("mousedown", (e) => { dragging = true; lastX = e.clientX; lastY = e.clientY; });
window.addEventListener("mouseup", () => { dragging = false; });
window.addEventListener("mousemove", (e) => {
  if (!dragging) return;
  originX -= (e.clientX - lastX) / cell;
  originY -= (e.clientY - lastY) / cell;
  lastX = e.clientX; lastY = e.clientY;
  requestFrame();
});
