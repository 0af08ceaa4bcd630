from hnd_ghnd_tpu.evals.coco_eval import CocoEvaluator, COCOEvalNP

__all__ = ["CocoEvaluator", "COCOEvalNP"]
