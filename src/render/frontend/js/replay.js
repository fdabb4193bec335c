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

// current frame's dynamic content + the previous frame's positions by
// agent id, for smooth interpolation while playing (reference UI animates
// agents between frames: render-handle.js _drawAgent(_mapData, _mapLastData))
let curDyn = null;       // {frame, events, agents, breads}
let lastPos = null;      // Map id -> [x, y] from the previous frame
let frameArrived = 0;    // performance.now() when curDyn landed

function drawFrame(body) {
  const parts = body.split(";");
  const agents = splitRecords(parts[1]).map(a => a.split(" ").map(Number));

  const prev = curDyn;
  lastPos = null;
  if (prev && frame === prev.frame + 1 &&
      document.getElementById("smooth").checked) {
    lastPos = new Map(prev.agents.map(f => [f[0], [f[1], f[2]]]));
  }
  curDyn = {
    frame: frame,
    events: splitRecords(parts[0]).map(e => e.split(" ").map(Number)),
    agents: agents,
    breads: splitRecords(parts[2]).map(b => b.split(" ").map(Number)),
  };
  frameArrived = performance.now();

  drawStatic(splitRecords(parts[3]));
  drawMinimap(parts[4]);
  drawCounts(parts[5]);
  drawDynamic(lastPos ? 0 : 1);
}

function sectorPath(cx, cy, radius, angleDeg, dirDeg) {
  // attack-range sector, centered on the agent, facing `dir` (NORTH=up at
  // dir 0; reference render-handle.js:449-467 draws the same arc rotated)
  const half = (angleDeg / 360) * Math.PI;  // half-angle in radians
  const center = (dirDeg * Math.PI) / 180 - Math.PI / 2;
  ctx.beginPath();
  if (angleDeg < 360) ctx.moveTo(cx, cy);
  ctx.arc(cx, cy, radius, center - half, center + half, false);
  if (angleDeg < 360) ctx.closePath();
  ctx.fill();
}

function drawDynamic(t) {
  if (!curDyn) return;
  ctx.clearRect(0, 0, cv.width, cv.height);
  const showRanges = document.getElementById("ranges").checked && cell >= 4;

  // food
  ctx.fillStyle = "rgba(210,180,80,1)";
  for (const b of curDyn.breads) {
    ctx.fillRect(toX(b[0]), toY(b[1]), cell, cell);
  }

  // attack-range layer (below bodies, like the reference's range canvas)
  if (showRanges) {
    for (const f of curDyn.agents) {
      const [id, x, y, group, dir] = f;
      const g = (config.group || [])[group] || {};
      ctx.fillStyle = g["attack-style"] || "rgba(0,0,0,0.1)";
      let w = g.width || 1, h = g.height || 1;
      if (dir % 180 !== 0) { const s = w; w = h; h = s; }
      sectorPath(toX(x) + w * cell / 2, toY(y) + h * cell / 2,
                 (Number(g["attack-radius"]) || 1) * cell,
                 Number(g["attack-angle"]) || 360, dir);
    }
  }

  // agent bodies + hp bars + facing ticks
  for (const f of curDyn.agents) {
    const [id, x1, y1, group, dir, hp] = f;
    let x = x1, y = y1;
    const lp = lastPos && lastPos.get(id);
    if (lp && t < 1) { x = lp[0] + (x1 - lp[0]) * t; y = lp[1] + (y1 - lp[1]) * t; }
    const style = config.group && config.group[group];
    let w = style ? style.width : 1, h = style ? style.height : 1;
    if (dir % 180 !== 0) { const s = w; w = h; h = s; }
    ctx.fillStyle = groupStyles[group] || "rgba(0,0,0,1)";
    ctx.fillRect(toX(x), toY(y), w * cell, h * cell);
    if (cell >= 6) {
      const tick = DIR_TICK[((dir % 360) + 360) % 360] || [1, 0.5];
      ctx.fillStyle = "rgba(0,0,0,0.55)";
      ctx.fillRect(toX(x) + tick[0] * (w * cell) - 2,
                   toY(y) + tick[1] * (h * cell) - 2, 3, 3);
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
  for (const e of curDyn.events) {
    const cx = toX(e[2]), cy = toY(e[3]);
    ctx.beginPath();
    ctx.moveTo(cx, cy); ctx.lineTo(cx + cell, cy + cell);
    ctx.moveTo(cx + cell, cy); ctx.lineTo(cx, cy + cell);
    ctx.stroke();
  }
}

// interpolation loop: while a fresh frame is <1 frame-period old, redraw
// the dynamic layer at the fractional position between frames
(function animate() {
  if (lastPos && curDyn) {
    const t = Math.min(1, (performance.now() - frameArrived) * fps / 1000);
    drawDynamic(t);
    if (t >= 1) lastPos = null;
  }
  window.requestAnimationFrame(animate);
})();

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

document.getElementById("ranges").addEventListener("change", () => drawDynamic(1));
document.getElementById("smooth").addEventListener("change", () => drawDynamic(1));

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
