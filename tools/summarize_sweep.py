#!/usr/bin/env python
"""Summarize check_correctness sweep logs (e.g. the derived-sf1x headroom
sweep, VERDICT r11 #4) into a compact committed artifact.

Usage: python tools/summarize_sweep.py OUT_MD LABEL LOG [LOG ...]
Later logs supersede earlier statuses per key (re-runs after fixes).
Parses pass/weak/FAIL/NEAR lines (progress-bar \\r noise tolerated), lists
every non-pass with its message, and records coverage vs the current
queries() registry so truncated sweeps are visible, never silent.
"""

from __future__ import annotations

import re
import sys


def main() -> None:
    out_md, label, logs = sys.argv[1], sys.argv[2], sys.argv[3:]
    results: dict[str, str] = {}
    messages: dict[str, str] = {}
    for log in logs:
        lines = (
            open(log, "rb")
            .read()
            .decode("utf8", "replace")
            .replace("\r", "\n")
            .splitlines()
        )
        for line in lines:
            m = re.match(r"^(pass|weak|fail|FAIL|NEAR)[\s]+(\S+?)([:\s].*)?$", line)
            if m:
                status = m.group(1).lower()
                key = m.group(2).rstrip(":")
                results[key] = status  # later logs supersede earlier ones
                if status != "pass":
                    messages[key] = (m.group(3) or "").strip()
                else:
                    messages.pop(key, None)
    sys.path.insert(0, ".")
    import __spark_entry__ as e

    keys = list(e.queries().keys())
    missing = [k for k in keys if k not in results]
    unknown = [k for k in results if k not in keys]
    counts = {
        s: sum(1 for v in results.values() if v == s)
        for s in ("pass", "weak", "fail", "near")
    }
    with open(out_md, "w") as f:
        f.write(f"# Sweep summary — {label}\n\n")
        f.write(f"Logs (later supersede): {', '.join(f'`{x}`' for x in logs)}. ")
        f.write(f"Registry: {len(keys)} keys.\n\n")
        f.write(
            f"**{counts['pass']} pass / {counts['fail']} fail / "
            f"{counts['near']} NEAR / {counts['weak']} weak**, "
            f"{len(missing)} not reached, {len(unknown)} not in current registry.\n\n"
        )
        for title, bucket in (
            ("Failures", "fail"),
            ("NEAR flags", "near"),
            ("Weak (by design)", "weak"),
        ):
            ks = sorted(k for k, v in results.items() if v == bucket)
            if ks:
                f.write(f"## {title}\n\n")
                for k in ks:
                    f.write(f"- `{k}` {messages.get(k, '')}\n")
                f.write("\n")
        if missing:
            f.write("## Not reached (sweep truncated before these)\n\n")
            for k in missing:
                f.write(f"- `{k}`\n")
            f.write("\n")
    print(f"{out_md}: {counts} missing={len(missing)}")


if __name__ == "__main__":
    main()
