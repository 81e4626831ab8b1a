"""Entry point (reference openvqe/main_quccsd_active_space.py)."""

from openvqe_tpu.vqe import VQE


def main():
    return VQE.algorithm("quccsd", "H4", "QUCCSD", "JW", True).execute()


if __name__ == "__main__":
    main()
