from .precision import HIGHEST, hmatmul
