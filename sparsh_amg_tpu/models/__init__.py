"""Test-problem generators.

SParSH-AMG's "model zoo" is its set of benchmark linear systems (SURVEY.md §1:
"the 'models' of this library are test problems"): 2D/3D Poisson finite
difference stencils, rotated anisotropic diffusion, linear elasticity, and
SuiteSparse matrices.  These generators build the same systems host-side with
scipy Kronecker products.
"""
from .poisson import poisson2d, poisson3d
from .anisotropic import anisotropic2d, anisotropic3d
from .convection import convection2d, convection3d
from .jump import jump2d
from .elasticity import (elasticity2d, elasticity2d_nullspace,
                         elasticity3d, elasticity3d_nullspace)
from .problem import Problem, get_problem

__all__ = [
    "poisson2d",
    "poisson3d",
    "anisotropic2d",
    "anisotropic3d",
    "convection2d",
    "convection3d",
    "jump2d",
    "elasticity2d",
    "elasticity2d_nullspace",
    "elasticity3d",
    "elasticity3d_nullspace",
    "Problem",
    "get_problem",
]
