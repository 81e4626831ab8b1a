"""Entry point (reference openvqe/main_qubit_adapt.py)."""

from openvqe_tpu.vqe import VQE


def main():
    return VQE.algorithm("qubit_adapt", "H2", "singlet_gsd", "JW",
                         False).execute()


if __name__ == "__main__":
    main()
