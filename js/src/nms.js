// Class-agnostic NMS in the browser — same semantics as
// yolov3_tpu/ops/nms.py (score = objectness × best class prob).

export async function yoloNms({ boxes, confidence, classProbs },
                              maxBoxes = 100, iouThreshold = 0.5, scoreThreshold = 0.1) {
  // tf.tidy for the synchronous tensor math — every intermediate
  // (squeezes, splits, concat) is reclaimed, not just a hand-kept list
  const { classIdx1d, scores1d, boxes2d, yxyx } = tf.tidy(() => {
    const scores = confidence.squeeze(-1).mul(classProbs.max(-1));
    const b2 = boxes.squeeze(0);        // (N, 4) xyxy
    // tf.image.nonMaxSuppressionAsync expects [y1, x1, y2, x2]
    const [xmin, ymin, xmax, ymax] = tf.split(b2, 4, -1);
    return {
      classIdx1d: classProbs.argMax(-1).squeeze(0),
      scores1d: scores.squeeze(0),
      boxes2d: b2,
      yxyx: tf.concat([ymin, xmin, ymax, xmax], -1),
    };
  });
  let selected = null;
  const gathered = [];
  try {
    selected = await tf.image.nonMaxSuppressionAsync(
      yxyx, scores1d, maxBoxes, iouThreshold, scoreThreshold);
    gathered.push(boxes2d.gather(selected), scores1d.gather(selected),
                  classIdx1d.gather(selected));
    const [boxesOut, scoresOut, classesOut] =
      await Promise.all(gathered.map((t) => t.array()));
    return { boxes: boxesOut, scores: scoresOut, classes: classesOut };
  } finally {
    tf.dispose([classIdx1d, scores1d, boxes2d, yxyx, selected, ...gathered]);
  }
}
