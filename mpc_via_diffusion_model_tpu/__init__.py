"""mpc_via_diffusion_model_tpu — a TPU-native control-simulation engine.

Brand-new JAX/XLA/Pallas rebuild of the capabilities of
`XuehuaOvO/MPC_via_Diffusion_Model` (Motion Planning Diffusion for MPC):
conditional DDPM imitation of MPC experts, receding-horizon diffusion
control loops compiled to single XLA programs, in-framework batched OCP
solvers for data generation, and data-parallel training over a device mesh.

Subpackages:
  core       — diffusion schedules, losses
  dynamics   — plant zoo (pure-function dynamics + quadratic costs)
  models     — temporal U-Net / point U-Net denoisers, AMPC baseline
  diffusion  — DDPM/DDIM/CFG training + sampling loops (lax.scan)
  data       — normalizers, dataset containers, expert data generation
  solvers    — batched iLQR / LQR experts (replace CasADi+IPOPT/acados)
  train      — jitted train step, EMA, checkpointing
  control    — receding-horizon diffusion-MPC runtime
  parallel   — mesh/sharding utilities
  ops        — Pallas TPU kernels for the hot paths
  eval       — parity metrics, timing harness
"""

__version__ = "0.1.0"
