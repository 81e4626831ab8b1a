"""Entry point (reference openvqe/main_fermionic_adapt.py): fermionic
ADAPT-VQE on H4, non-active then active."""

from openvqe_tpu.vqe import VQE


def main():
    VQE.algorithm("fermionic_adapt", "H4", "spin_complement_gsd", "JW",
                  False).execute()
    VQE.algorithm("fermionic_adapt", "H4", "spin_complement_gsd", "JW",
                  True).execute()


if __name__ == "__main__":
    main()
