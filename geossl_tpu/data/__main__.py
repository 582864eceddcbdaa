"""Dataset generation entry point (reference: examples/generate_Molecule3D.py).

    python -m geossl_tpu.data molecule3d --root data/Molecule3D [--subset 1000000]
    python -m geossl_tpu.data qm9        --root data/QM9
    python -m geossl_tpu.data md17       --root data/MD17 --task aspirin
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=["molecule3d", "qm9", "md17"])
    p.add_argument("--root", required=True)
    p.add_argument("--subset", type=int, default=None)
    p.add_argument("--task", default="aspirin")
    args = p.parse_args()
    if args.dataset == "molecule3d":
        from geossl_tpu.data.molecule3d import load_molecule3d

        store = load_molecule3d(args.root, subset=args.subset)
    elif args.dataset == "qm9":
        from geossl_tpu.data.qm9 import load_qm9

        store = load_qm9(args.root)
    else:
        from geossl_tpu.data.md17 import load_md17

        store = load_md17(args.root, args.task)
    print(f"{args.dataset}: {len(store)} molecules cached")


if __name__ == "__main__":
    main()
