from .runtime import ClosedLoopResult, make_replan_fn, make_closed_loop, make_nmpc_closed_loop, make_ampc_closed_loop
from .metrics import track_parity, per_step_mpc_costs, count_swing_modes
from .planner import make_planner, PlanResult
