from .lqr import LQRSolution, lqr_gains, lqr_solve, lqr_solve_batched
from .ilqr import ILQRConfig, ILQRSolution, ilqr_solve, ilqr_solve_batched, pd_solve
from .mppi import MPPIConfig, mppi_solve, mppi_solve_batched
