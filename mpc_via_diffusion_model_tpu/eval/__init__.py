from .timing import time_fn, Timer
