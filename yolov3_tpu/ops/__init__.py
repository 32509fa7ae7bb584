from .decode import yolo_decode
from .nms import yolo_nms
from .loss import yolo_loss_terms, make_loss_fn
from .assign import assign_targets

__all__ = ["yolo_decode", "yolo_nms", "yolo_loss_terms", "make_loss_fn", "assign_targets"]
