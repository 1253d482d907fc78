from .schedules import DiffusionSchedule, make_schedule, BETA_SCHEDULES
from .losses import weighted_l1, weighted_l2, LOSSES
