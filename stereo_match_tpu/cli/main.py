"""Unified CLI entry point (`smt <subcommand>`). Subcommands land as the
pipeline widens; mirrors the reference's four CLIs (SURVEY.md §1 L2)."""
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    print("stereo-match-tpu CLI: subcommands arriving as stages land "
          "(build-dataset, rectify, match, reproject, benchmark)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
