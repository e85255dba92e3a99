from bm2f_tpu.evaluation.coco_eval import COCOMaskAPEvaluator
from bm2f_tpu.evaluation.sem_seg_eval import SemSegEvaluator
from bm2f_tpu.evaluation.panoptic_eval import PanopticEvaluator

__all__ = ["COCOMaskAPEvaluator", "SemSegEvaluator", "PanopticEvaluator"]
