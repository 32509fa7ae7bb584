// Canvas rendering of detections over the displayed image.

const PALETTE = ["#e6194b", "#3cb44b", "#4363d8", "#f58231", "#911eb4",
                 "#46f0f0", "#f032e6", "#bcf60c", "#fabebe", "#008080"];

function hashCode(s) {
  let h = 0;
  for (let i = 0; i < s.length; i++) h = (Math.imul(31, h) + s.charCodeAt(i)) | 0;
  return Math.abs(h);
}

export function renderDetections(overlay, image, detections) {
  overlay.width = image.width;
  overlay.height = image.height;
  const ctx = overlay.getContext("2d");
  ctx.clearRect(0, 0, overlay.width, overlay.height);
  ctx.lineWidth = 2;
  ctx.font = "14px sans-serif";
  for (const det of detections) {
    const [x0, y0, x1, y1] = det.box;
    const color = PALETTE[hashCode(det.className) % PALETTE.length];
    ctx.strokeStyle = color;
    ctx.fillStyle = color;
    const px0 = x0 * image.width, py0 = y0 * image.height;
    ctx.strokeRect(px0, py0, (x1 - x0) * image.width, (y1 - y0) * image.height);
    const label = `${det.className}: ${(100 * det.score).toFixed(0)}%`;
    const tw = ctx.measureText(label).width;
    ctx.fillRect(px0, Math.max(py0 - 18, 0), tw + 8, 18);
    ctx.fillStyle = "black";
    ctx.fillText(label, px0 + 4, Math.max(py0 - 4, 12));
  }
}
