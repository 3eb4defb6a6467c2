"""Self-contained interactive HTML analyzer export.

Counterpart of the reference's wxWidgets analyzer GUI
(reference: examples/analyzer.cc:115 — zoom, per-frame navigation,
block-size / motion-vector / skip / bit-accounting overlays), rendered
as one dependency-free HTML file (canvas + embedded JSON + data-URI
PNGs) since this environment has no display toolkit.  Built by
`tools/analyze.py --html out.html`.
"""

import base64
import json

_PAGE = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>daala-tpu analyzer</title>
<style>
 body { font: 13px sans-serif; background: #181818; color: #ddd;
        margin: 12px; }
 #bar { margin-bottom: 8px; display: flex; gap: 14px;
        align-items: center; flex-wrap: wrap; }
 #bar label { user-select: none; }
 #wrap { display: flex; gap: 16px; align-items: flex-start; }
 #stage { position: relative; overflow: auto; max-width: 75vw;
          max-height: 85vh; border: 1px solid #444; }
 canvas { display: block; image-rendering: pixelated; }
 #side { min-width: 270px; }
 table { border-collapse: collapse; }
 td, th { padding: 1px 8px; text-align: left; }
 .num { text-align: right; font-variant-numeric: tabular-nums; }
 .bsz { color: #8cf; } .barbg { background: #333; height: 9px;
        width: 120px; display: inline-block; vertical-align: middle; }
 .barfg { background: #4a9; height: 9px; display: block; }
 #tip { position: fixed; pointer-events: none; background: #000c;
        padding: 4px 7px; border: 1px solid #666; display: none;
        z-index: 9; }
 button { background: #333; color: #ddd; border: 1px solid #555; }
</style></head><body>
<div id="bar">
 <button id="prev">&#9664;</button>
 <input type="range" id="slider" min="0" value="0">
 <button id="next">&#9654;</button>
 <span id="label"></span>
 <label><input type="checkbox" id="ov_bs"> block sizes</label>
 <label><input type="checkbox" id="ov_mv"> motion vectors</label>
 <label><input type="checkbox" id="ov_sk"> skip</label>
 <label><input type="checkbox" id="ov_dr"> dering</label>
 <label><input type="checkbox" id="ov_ht"> bits heatmap</label>
 <label>zoom <select id="zoom"><option>1</option><option>2</option>
   <option selected>3</option><option>4</option><option>6</option>
 </select></label>
</div>
<div id="wrap">
 <div id="stage"><canvas id="cv"></canvas></div>
 <div id="side">
   <table id="meta"></table>
   <h4 style="margin:10px 0 4px">bits by symbol class</h4>
   <table id="acct"></table>
 </div>
</div>
<div id="tip"></div>
<script>
const FRAMES = %%DATA%%;
const W = %%W%%, H = %%H%%;
const cv = document.getElementById('cv'), cx = cv.getContext('2d');
const slider = document.getElementById('slider');
slider.max = FRAMES.length - 1;
let cur = 0, imgs = [];
FRAMES.forEach((f, i) => {
  const im = new Image();
  im.onload = () => { if (i === cur) draw(); };
  im.src = f.img; imgs[i] = im;
});
const BS_COLORS = ['#e44', '#ea4', '#4d4', '#4ad', '#a6e'];
function z() { return +document.getElementById('zoom').value; }
function on(id) { return document.getElementById(id).checked; }
function draw() {
  const f = FRAMES[cur], s = z();
  cv.width = W * s; cv.height = H * s;
  cx.imageSmoothingEnabled = false;
  cx.drawImage(imgs[cur], 0, 0, W * s, H * s);
  if (on('ov_ht')) {
    let mx = 1;
    f.heat.forEach(r => r.forEach(v => { if (v > mx) mx = v; }));
    for (let y = 0; y < f.heat.length; y++)
      for (let x = 0; x < f.heat[y].length; x++) {
        const v = f.heat[y][x];
        if (!v) continue;
        const a = Math.log2(1 + v) / Math.log2(1 + mx);
        cx.fillStyle = `rgba(255,${(200 - 180 * a) | 0},0,${0.55 * a})`;
        cx.fillRect(x * 4 * s, y * 4 * s, 4 * s, 4 * s);
      }
  }
  if (on('ov_sk') && f.skip) {
    cx.fillStyle = 'rgba(60,140,255,0.35)';
    for (let y = 0; y < f.skip.length; y++)
      for (let x = 0; x < f.skip[y].length; x++)
        if (f.skip[y][x]) cx.fillRect(x * 4 * s, y * 4 * s, 4 * s, 4 * s);
  }
  if (on('ov_bs')) {
    // f.bsize: per 8x8 unit, the containing block's size level 0..4.
    // Draw each block's outline once (top-left unit of its block).
    cx.lineWidth = 1;
    for (let y = 0; y < f.bsize.length; y++)
      for (let x = 0; x < f.bsize[y].length; x++) {
        const b = f.bsize[y][x], n = 1 << b;      // units per block
        if (b > 0 && ((y % n) || (x % n))) continue;
        cx.strokeStyle = BS_COLORS[b];
        if (b === 0) {   // 4x4 leaves: mark the split inside the unit
          cx.strokeRect(x * 8 * s + .5, y * 8 * s + .5, 8 * s, 8 * s);
          cx.beginPath();
          cx.moveTo(x * 8 * s + 4 * s, y * 8 * s);
          cx.lineTo(x * 8 * s + 4 * s, y * 8 * s + 8 * s);
          cx.moveTo(x * 8 * s, y * 8 * s + 4 * s);
          cx.lineTo(x * 8 * s + 8 * s, y * 8 * s + 4 * s);
          cx.stroke();
        } else {
          cx.strokeRect(x * 8 * s + .5, y * 8 * s + .5,
                        n * 8 * s, n * 8 * s);
        }
      }
  }
  if (on('ov_dr') && f.dering) {
    cx.font = `${10 * Math.max(1, s / 2)}px sans-serif`;
    cx.fillStyle = '#fe6';
    for (let y = 0; y < f.dering.length; y++)
      for (let x = 0; x < f.dering[y].length; x++)
        cx.fillText(f.dering[y][x], (x * 64 + 2) * s, (y * 64 + 12) * s);
  }
  if (on('ov_mv') && f.mv) {
    cx.strokeStyle = '#3f6'; cx.fillStyle = '#3f6'; cx.lineWidth = 1;
    const sp = f.mvsp * s;                 // vertex spacing in px
    f.mv.forEach(([vx, vy, mx, my, ref]) => {
      const x0 = vx * sp, y0 = vy * sp;
      cx.strokeStyle = ref === 2 ? '#fa3' : (ref === 3 ? '#3cf' : '#3f6');
      cx.beginPath(); cx.arc(x0, y0, 1.2 * s, 0, 7); cx.fill();
      // mx/my are 1/8-pel; draw at 1:1 pixel scale.
      cx.moveTo(x0, y0); cx.lineTo(x0 + mx / 8 * s, y0 + my / 8 * s);
      cx.stroke();
    });
  }
  const m = f.meta;
  document.getElementById('label').textContent =
    `frame ${cur}/${FRAMES.length - 1} (${m.frame_type}) ` +
    `${m.bytes} B q=${m.quantizer}`;
  const rows = [['type', m.frame_type], ['bytes', m.bytes],
    ['quantizer', m.quantizer], ['MV vertices', m.mv_vertices],
    ['bits (q3)', m.bits_total_q3]];
  for (const [k, v] of Object.entries(m.bsize_histogram_8x8units))
    rows.push([`blocks ${k}`, v]);
  document.getElementById('meta').innerHTML = rows.map(
    ([k, v]) => `<tr><td>${k}</td><td class=num>${v}</td></tr>`).join('');
  const acct = Object.entries(m.bits_by_symbol_class_q3)
    .sort((a, b) => b[1] - a[1]);
  const amax = acct.length ? acct[0][1] : 1;
  document.getElementById('acct').innerHTML = acct.map(([k, v]) =>
    `<tr><td>${k}</td><td class=num>${(v / 8).toFixed(0)}B</td>` +
    `<td><span class=barbg><span class=barfg style="width:${(100 * v /
      amax).toFixed(1)}%"></span></span></td></tr>`).join('');
}
function go(i) {
  cur = Math.max(0, Math.min(FRAMES.length - 1, i));
  slider.value = cur; draw();
}
document.getElementById('prev').onclick = () => go(cur - 1);
document.getElementById('next').onclick = () => go(cur + 1);
slider.oninput = () => go(+slider.value);
document.getElementById('zoom').onchange = draw;
['ov_bs', 'ov_mv', 'ov_sk', 'ov_dr', 'ov_ht'].forEach(id =>
  document.getElementById(id).onchange = draw);
document.addEventListener('keydown', e => {
  if (e.key === 'ArrowLeft') go(cur - 1);
  if (e.key === 'ArrowRight') go(cur + 1);
});
const tip = document.getElementById('tip');
cv.onmousemove = e => {
  const r = cv.getBoundingClientRect(), s = z();
  const px = (e.clientX - r.left) / s | 0, py = (e.clientY - r.top) / s | 0;
  const f = FRAMES[cur], x4 = px >> 2, y4 = py >> 2;
  if (x4 >= f.heat[0].length || y4 >= f.heat.length) {
    tip.style.display = 'none'; return;
  }
  const b = f.bsize[Math.min(py >> 3, f.bsize.length - 1)]
                   [Math.min(px >> 3, f.bsize[0].length - 1)];
  const sk = f.skip ? f.skip[y4][x4] : '-';
  tip.innerHTML = `(${px},${py}) 4x4 [${x4},${y4}]<br>` +
    `bits ${(f.heat[y4][x4] / 8).toFixed(1)}B · ` +
    `<span class=bsz>${4 << b}x${4 << b}</span> · skip ${sk}`;
  tip.style.display = 'block';
  tip.style.left = (e.clientX + 14) + 'px';
  tip.style.top = (e.clientY + 14) + 'px';
};
cv.onmouseleave = () => { tip.style.display = 'none'; };
go(0);
</script></body></html>
"""


def write_html(path, frames_data, pic_w, pic_h):
    """frames_data: list of dicts with keys img (PNG bytes), meta,
    bsize, mv, mvsp, skip, dering, heat."""
    payload = []
    for f in frames_data:
        d = dict(f)
        d["img"] = ("data:image/png;base64,"
                    + base64.b64encode(f["img"]).decode("ascii"))
        payload.append(d)
    page = (_PAGE
            .replace("%%DATA%%", json.dumps(payload))
            .replace("%%W%%", str(pic_w))
            .replace("%%H%%", str(pic_h)))
    with open(path, "w") as fh:
        fh.write(page)
