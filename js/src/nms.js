// Class-agnostic NMS in the browser — same semantics as
// yolov3_tpu/ops/nms.py (score = objectness × best class prob).

export async function yoloNms({ boxes, confidence, classProbs },
                              maxBoxes = 100, iouThreshold = 0.5, scoreThreshold = 0.1) {
  const classIdx = classProbs.argMax(-1);
  const bestProb = classProbs.max(-1);
  const scores = confidence.squeeze(-1).mul(bestProb);

  const boxes2d = boxes.squeeze(0);      // (N, 4) xyxy
  const scores1d = scores.squeeze(0);    // (N,)
  // tf.image.nonMaxSuppressionAsync expects [y1, x1, y2, x2]
  const [xmin, ymin, xmax, ymax] = tf.split(boxes2d, 4, -1);
  const yxyx = tf.concat([ymin, xmin, ymax, xmax], -1);

  const selected = await tf.image.nonMaxSuppressionAsync(
    yxyx, scores1d, maxBoxes, iouThreshold, scoreThreshold);

  const boxesOut = await boxes2d.gather(selected).array();
  const scoresOut = await scores1d.gather(selected).array();
  const classesOut = await classIdx.squeeze(0).gather(selected).array();
  tf.dispose([classIdx, bestProb, scores, boxes2d, scores1d, yxyx, xmin, ymin, xmax, ymax, selected]);
  return { boxes: boxesOut, scores: scoresOut, classes: classesOut };
}
