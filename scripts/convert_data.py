"""Convert a reference biolip.pt (torch pickle) to the native numpy pickle.

The native format loads without torch and is what every CLI's --data_file
accepts (both formats work; this just removes the torch dependency)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="biolip.pt")
    parser.add_argument("--output", required=True, help="output .pkl")
    args = parser.parse_args()

    from e3diff_tpu.data.dataset import load_complexes, save_complexes

    data = load_complexes(args.input)
    save_complexes(data, args.output)
    print(f"converted {len(data)} complexes -> {args.output}")


if __name__ == "__main__":
    main()
