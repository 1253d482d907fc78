from .gaussian_diffusion import GaussianDiffusion, HardConds, apply_hard_conds
