from .timing import pipelined_time_fn, time_fn, Timer
from .planning_metrics import planning_metrics, get_best_index
from .summaries import MetricsWriter, make_trajectory_summary
