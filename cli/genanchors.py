#!/usr/bin/env python
"""Anchor-generation CLI (argparse parity with the reference
genanchors.py): k-means under 1−IoU over the train labels, writes
anchors{k}.txt; --num_clusters 0 sweeps k=1..10."""

import argparse

import _bootstrap  # noqa: F401


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--traintxt", default="", help="path to traintxt")
    parser.add_argument("--output_dir", default="./", type=str,
                        help="Output anchor directory")
    parser.add_argument("--num_clusters", default=6, type=int,
                        help="number of clusters")
    parser.add_argument("--input_width", default=352, type=int,
                        help="model input width")
    parser.add_argument("--input_height", default=352, type=int,
                        help="model input height")
    parser.add_argument("--seed", default=None, type=int,
                        help="k-means init seed (default: nondeterministic)")
    opt = parser.parse_args()

    from fastdet.anchors import generate_anchors
    generate_anchors(opt.traintxt, opt.output_dir, opt.num_clusters,
                     opt.input_width, opt.input_height, seed=opt.seed)


if __name__ == "__main__":
    main()
