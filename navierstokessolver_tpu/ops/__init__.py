from . import stencils, poisson  # noqa: F401
