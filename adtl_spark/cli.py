"""Command-line interface mirroring the reference's ``adtl`` CLI surface
(reference: src/adtl/cli.py — ``parse`` and ``check`` subcommands)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def handle_parse(args: argparse.Namespace) -> int:
    from adtl_spark.api import Parser

    if args.format == "parquet" and _spec_returns_unmatched(args.spec):
        print(
            "adtl-spark: returnUnmatched specs produce mixed-type columns "
            "and cannot write parquet (reference behaviour)",
            file=sys.stderr,
        )
        return 1
    parser = Parser(
        args.spec,
        include_defs=args.include_def or [],
        include_transform=args.include_transform,
    )
    parser.parse(args.file, encoding=args.encoding)
    output = args.output or parser.name
    parser.save(output, format=args.format)
    if not args.quiet:
        parser.show_report()
    if args.save_report:
        report = parser.build_report()
        Path(args.save_report).write_text(json.dumps(report, indent=2, default=int))
    return 0


def _spec_returns_unmatched(spec_path: str) -> bool:
    from adtl_spark.spec import read_spec_file

    try:
        doc = read_spec_file(spec_path)
    except Exception:
        return False
    return bool(doc.get("adtl", {}).get("returnUnmatched", False))


def handle_check(args: argparse.Namespace) -> int:
    from adtl_spark.api import Parser

    parser = Parser(args.spec)
    unmapped, absent = parser.check_spec_fields(args.file)
    status = 0
    if absent:
        print(f"ERROR: fields in spec but not in data: {sorted(absent)}")
        status = 1
    if unmapped:
        print(f"WARNING: fields in data but not mapped by spec: {sorted(unmapped)}")
    if status == 0:
        print("spec and data fields are consistent")
    return status


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="adtl-spark",
        description="Spec-driven ETL on Spark (adtl-compatible specification format)",
    )
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("parse", help="transform a source file according to a spec")
    p.add_argument("spec", help="specification file (.toml or .json)")
    p.add_argument("file", help="source CSV file")
    p.add_argument("-o", "--output", help="output file prefix (default: spec name)")
    p.add_argument("--encoding", default="UTF-8", help="source file encoding")
    p.add_argument(
        "--format", default="csv", choices=("csv", "parquet"), help="output format"
    )
    p.add_argument(
        "--include-def",
        action="append",
        help="additional definition file(s) to splice into adtl.defs",
    )
    p.add_argument(
        "--include-transform", help="Python file with custom transform functions"
    )
    p.add_argument("-q", "--quiet", action="store_true", help="suppress report")
    p.add_argument("--save-report", help="save validation report as JSON")
    p.add_argument(
        "--parallel",
        action="store_true",
        help="accepted for reference-CLI compatibility; execution is always "
        "parallel on Spark",
    )
    p.set_defaults(func=handle_parse)

    c = sub.add_parser("check", help="check spec fields against a data file")
    c.add_argument("spec", help="specification file")
    c.add_argument("file", help="source CSV file")
    c.set_defaults(func=handle_check)

    args = ap.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
