"""One-shot codemod: replace cross-engine round-parity sites with the
bit-deterministic floor formula (functions/rounding.py). Run once in
round 9; kept for provenance."""
import re
import sys

PATH = "pointdatabase_spark/queries.py"
SCALES = {0: "1.0", 2: "100.0", 4: "10000.0", 6: "1000000.0",
          9: "1000000000.0", 12: "1000000000000.0"}


def balanced(src, start):
    """src[start] == '(' -> index just past matching ')'."""
    depth = 0
    i = start
    while i < len(src):
        c = src[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced")


def split_last_comma(s):
    depth = 0
    for i in range(len(s) - 1, -1, -1):
        c = s[i]
        if c == ")":
            depth += 1
        elif c == "(":
            depth -= 1
        elif c == "," and depth == 0:
            return s[:i], s[i + 1:].strip()
    raise ValueError(f"no top-level comma in {s!r}")


def squash(s):
    return re.sub(r"\s+", " ", s.strip())


def main():
    src = open(PATH).read()
    out = []
    pos = 0
    n_sql = n_py = 0
    while True:
        m_sql = src.find("ROUND(", pos)
        m_py = src.find("F.round(", pos)
        cands = [x for x in (m_sql, m_py) if x != -1]
        if not cands:
            out.append(src[pos:])
            break
        at = min(cands)
        is_py = (at == m_py)
        out.append(src[pos:at])
        op = at + (len("F.round") if is_py else len("ROUND"))
        end = balanced(src, op)
        inner = src[op + 1:end - 1]
        expr, n_str = split_last_comma(inner)
        expr = expr.strip()
        n = int(n_str)
        line = src.count("\n", 0, at) + 1
        if is_py and "/ 10000" in expr:
            # bin-key semantics (round-to-bin), not parity rounding
            out.append(src[at:end])
            pos = end
            print(f"KEEP py  L{line}: {squash(expr)}, {n}")
            continue
        if is_py and n == 0 and expr in ("x", "y") \
                and src[end:end + len('.cast("long")')] == '.cast("long")':
            rep = f"F.floor({expr} + F.lit(0.5))"
            out.append(rep)
            pos = end + len('.cast("long")')
            n_py += 1
            print(f"CRS  py  L{line}: {expr} -> {rep}")
            continue
        if is_py:
            rep = f"_rq({expr}, {n})"
            n_py += 1
        else:
            s = SCALES[n]
            rep = f"floor(({expr}) * {s} + 0.5) / {s}"
            n_sql += 1
        out.append(rep)
        pos = end
        kind = "py " if is_py else "sql"
        print(f"CONV {kind} L{line}: {squash(expr)[:90]}, {n}")
    open(PATH, "w").write("".join(out))
    print(f"\nconverted: {n_sql} SQL + {n_py} py sites")


if __name__ == "__main__":
    sys.exit(main())
