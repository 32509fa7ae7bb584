// YOLO head decode in TFJS — mirrors yolov3_tpu/ops/decode.py:
// sigmoid xy/obj/class, cell offsets, exp(wh)*anchors, xyxy corners,
// flattened and concatenated over scales in model output order.

export function decodeOutputs(outputGrids, anchorsTable, nClasses) {
  return tf.tidy(() => {
    const allBoxes = [], allConf = [], allProbs = [];
    outputGrids.forEach((grid, scale) => {
      const [b, gh, gw, na] = grid.shape;
      const xyL = grid.slice([0, 0, 0, 0, 0], [b, gh, gw, na, 2]);
      const whL = grid.slice([0, 0, 0, 0, 2], [b, gh, gw, na, 2]);
      const objL = grid.slice([0, 0, 0, 0, 4], [b, gh, gw, na, 1]);
      const clsL = grid.slice([0, 0, 0, 0, 5], [b, gh, gw, na, nClasses]);

      const col = tf.range(0, gw).reshape([1, 1, gw, 1, 1]).tile([1, gh, 1, na, 1]);
      const row = tf.range(0, gh).reshape([1, gh, 1, 1, 1]).tile([1, 1, gw, na, 1]);
      const offsets = tf.concat([col, row], -1);

      const anchors = tf.tensor(anchorsTable[scale]); // (na, 2) normalized
      const center = tf.sigmoid(xyL).add(offsets).div(tf.tensor([gw, gh]));
      const wh = tf.exp(whL).mul(anchors.reshape([1, 1, 1, na, 2]));
      const boxes = tf.concat([center.sub(wh.div(2)), center.add(wh.div(2))], -1);

      allBoxes.push(boxes.reshape([b, gh * gw * na, 4]));
      allConf.push(tf.sigmoid(objL).reshape([b, gh * gw * na, 1]));
      allProbs.push(tf.sigmoid(clsL).reshape([b, gh * gw * na, nClasses]));
    });
    return {
      boxes: tf.concat(allBoxes, 1),
      confidence: tf.concat(allConf, 1),
      classProbs: tf.concat(allProbs, 1),
    };
  });
}
