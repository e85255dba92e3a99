from bm2f_tpu.losses.criterion import SetCriterionConfig, set_criterion

__all__ = ["SetCriterionConfig", "set_criterion"]
