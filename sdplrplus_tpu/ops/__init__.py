from .device import DeviceProblem, to_device
from .forward import A_uu, A_uv
from .adjoint import apply_S, assemble_s_tri, gradient
