"""Entry point (reference openvqe/main_ucc_active_space.py)."""

from openvqe_tpu.vqe import VQE


def main():
    return VQE.algorithm("ucc", "H4", "sUPCCGSD", "JW", True).execute()


if __name__ == "__main__":
    main()
