"""openvqe_tpu: a TPU-native variational quantum eigensolver framework.

The capabilities of OpenVQE rebuilt on one differentiable JAX/XLA
statevector engine — see README.md for the architecture and PARITY.md for
the component-by-component mapping to the reference.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (keep bare `import openvqe_tpu` cheap)
    if name == "VQE":
        from .vqe import VQE
        return VQE
    if name == "VQEConfig":
        from .config import VQEConfig
        return VQEConfig
    raise AttributeError(name)
