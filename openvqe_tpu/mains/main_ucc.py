"""Entry point (reference openvqe/main_ucc.py): UCC on H2/6-31G with the
k-UpCCGSD generator under JW, non-active space."""

from openvqe_tpu.vqe import VQE


def main():
    return VQE.algorithm("ucc", "H2", "sUPCCGSD", "JW", False).execute()


if __name__ == "__main__":
    main()
