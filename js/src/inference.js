// Browser inference pipeline: load TFJS graph model (exported via
// utilities/convert_model_to_tfjs.py), preprocess (resize 416, /255),
// forward → decode → NMS → render.

import { decodeOutputs } from "./decode.js";
import { yoloNms } from "./nms.js";
import { renderDetections } from "./render.js";

const IMAGE_SIZE = 416;
// normalized anchors paired with head outputs, 13-grid first (match your
// training anchors file; these are the COCO yolov3 defaults / 416)
export const DEFAULT_ANCHORS = [
  [[116 / 416, 90 / 416], [156 / 416, 198 / 416], [373 / 416, 326 / 416]],
  [[30 / 416, 61 / 416], [62 / 416, 45 / 416], [59 / 416, 119 / 416]],
  [[10 / 416, 13 / 416], [16 / 416, 30 / 416], [33 / 416, 23 / 416]],
];

let cachedModel = null;
let cachedUrl = null;

export async function loadModel(modelUrl) {
  if (cachedModel && cachedUrl === modelUrl) return cachedModel;
  cachedModel = await tf.loadGraphModel(modelUrl);
  cachedUrl = modelUrl;
  return cachedModel;
}

export function imagePreprocess(image) {
  return tf.tidy(() =>
    tf.browser.fromPixels(image)
      // halfPixelCenters=true: tf.image.resize v2 sampling — what the
      // Python pipeline (data/image.py) and the native decoder use; the
      // TFJS default (false) is TF1 sampling, a ~0.5px offset that would
      // shift boxes vs the same image through the Python path
      .resizeBilinear([IMAGE_SIZE, IMAGE_SIZE], false, true)
      .toFloat()
      .div(255)
      .expandDims(0));
}

export async function runInference({ modelUrl, image, overlay, classNames,
                                     anchors = DEFAULT_ANCHORS,
                                     maxBoxes = 100, iouThreshold = 0.5,
                                     scoreThreshold = 0.1 }) {
  const model = await loadModel(modelUrl);
  const input = imagePreprocess(image);
  let outputs = null;
  let decoded = null;
  try {
    outputs = await model.executeAsync(input);
    if (!Array.isArray(outputs)) outputs = [outputs];
    // order by descending stride: fewest cells (13-grid) first
    outputs.sort((a, b) => a.shape[1] - b.shape[1]);

    const nClasses = classNames.length;
    decoded = decodeOutputs(outputs, anchors.slice(0, outputs.length), nClasses);
    const { boxes, scores, classes } = await yoloNms(decoded, maxBoxes, iouThreshold, scoreThreshold);

    const detections = boxes.map((box, i) => ({
      box,
      score: scores[i],
      className: classNames[classes[i]] ?? `class_${classes[i]}`,
    }));
    if (overlay) renderDetections(overlay, image, detections);
    return detections;
  } finally {
    // dispose even when decode/NMS throws (shape mismatch etc.) — a caught
    // error + retry loop must not strand head tensors in GPU memory
    const owned = [input, ...(outputs ?? [])];
    if (decoded) owned.push(decoded.boxes, decoded.confidence, decoded.classProbs);
    tf.dispose(owned);
  }
}
