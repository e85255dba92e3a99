from bm2f_tpu.matching.hungarian import hungarian_assign
from bm2f_tpu.matching.matcher import hungarian_matcher_costs, match

__all__ = ["hungarian_assign", "hungarian_matcher_costs", "match"]
