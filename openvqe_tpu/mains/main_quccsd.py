"""Entry point (reference openvqe/main_quccsd.py)."""

from openvqe_tpu.vqe import VQE


def main():
    return VQE.algorithm("quccsd", "H4", "QUCCSD", "JW", False).execute()


if __name__ == "__main__":
    main()
