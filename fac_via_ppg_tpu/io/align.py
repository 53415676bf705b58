"""Praat TextGrid <-> string serialization.

Equivalent of reference src/common/align.py:23-195 (write_tg_to_str /
read_tg_from_str), which the Utterance container uses to store forced
alignments inside the DataUtterance proto as a Praat-format string.
Supports the long ("ooTextFile") format for both interval and point tiers,
Praat's doubled-double-quote escaping, and multi-line marks.
"""

from __future__ import annotations

import logging
import re
from io import StringIO

from fac_via_ppg_tpu.io.textgrid import (
    Interval,
    IntervalTier,
    Point,
    PointTier,
    TextGrid,
)

DEFAULT_TEXTGRID_PRECISION = 5


def write_tg_to_str(tg: TextGrid, null: str = "") -> str:
    """Serialize a TextGrid into a Praat long-format string."""
    if not isinstance(tg, TextGrid):
        logging.warning("Alignment does not exist!")
        return None
    sink = StringIO()
    w = lambda s: print(s, file=sink)
    w('File type = "ooTextFile"')
    w('Object class = "TextGrid"\n')
    w("xmin = {0}".format(tg.minTime))
    max_t = tg.maxTime
    if not max_t:
        max_t = max(
            t.maxTime if t.maxTime else t[-1].maxTime for t in tg.tiers
        )
    w("xmax = {0}".format(max_t))
    w("tiers? <exists>")
    w("size = {0}".format(len(tg)))
    w("item []:")
    for i, tier in enumerate(tg.tiers, 1):
        w("\titem [{0}]:".format(i))
        if isinstance(tier, IntervalTier):
            w('\t\tclass = "IntervalTier"')
            w('\t\tname = "{0}"'.format(tier.name))
            w("\t\txmin = {0}".format(tier.minTime))
            w("\t\txmax = {0}".format(max_t))
            output = tier._fillInTheGaps(null)
            w("\t\tintervals: size = {0}".format(len(output)))
            for j, interval in enumerate(output, 1):
                w("\t\t\tintervals [{0}]:".format(j))
                w("\t\t\t\txmin = {0}".format(interval.minTime))
                w("\t\t\t\txmax = {0}".format(interval.maxTime))
                mark = interval.mark.replace('"', '""')
                w('\t\t\t\ttext = "{0}"'.format(mark))
        elif isinstance(tier, PointTier):
            w('\t\tclass = "TextTier"')
            w('\t\tname = "{0}"'.format(tier.name))
            w("\t\txmin = {0}".format(tier.minTime))
            w("\t\txmax = {0}".format(max_t))
            w("\t\tpoints: size = {0}".format(len(tier)))
            for k, point in enumerate(tier, 1):
                w("\t\t\tpoints [{0}]:".format(k))
                w("\t\t\t\ttime = {0}".format(point.time))
                mark = point.mark.replace('"', '""')
                w('\t\t\t\tmark = "{0}"'.format(mark))
    text = sink.getvalue()
    sink.close()
    return text


def parse_line(line: str, short: bool, to_round: int):
    line = line.strip()
    if short:
        if '"' in line:
            return line[1:-1]
        return round(float(line), to_round)
    if '"' in line:
        m = re.match(r'.+? = "(.*)"', line)
        return m.groups()[0]
    m = re.match(r".+? = (.*)", line)
    return round(float(m.groups()[0]), to_round)


def parse_header(source) -> tuple:
    header = source.readline()
    m = re.match(r'File type = "([\w ]+)"', header)
    if m is None or not m.groups()[0].startswith("ooTextFile"):
        raise ValueError(
            "The file could not be parsed as a Praat text file as it is "
            "lacking a proper header."
        )
    short = "short" in m.groups()[0]
    file_type = parse_line(source.readline(), short, "")
    source.readline()
    return file_type, short


def get_mark(text, short: bool) -> str:
    """Read a (possibly multi-line) text/mark entry, unescaping doubled
    double-quotes."""
    line = text.readline()
    if not short and not re.match(r'^\s*(text|mark) = "', line):
        raise ValueError("Bad entry: " + line)
    while line.count('"') % 2:
        next_line = text.readline()
        if not next_line:
            raise EOFError("Bad entry: " + line[:20] + "...")
        line += next_line
    if short:
        pattern = r'^"(.*?)"\s*$'
    else:
        pattern = r'^\s*(text|mark) = "(.*?)"\s*$'
    entry = re.match(pattern, line, re.DOTALL)
    return entry.groups()[-1].replace('""', '"')


def read_tg_from_str(tg_str: str,
                     round_digits: int = DEFAULT_TEXTGRID_PRECISION) -> TextGrid:
    """Parse a Praat-format string back into a TextGrid."""
    source = StringIO(tg_str)
    tg = TextGrid()

    file_type, short = parse_header(source)
    if file_type != "TextGrid":
        raise ValueError(
            "The file could not be parsed as a TextGrid as it is lacking a "
            "proper header."
        )
    tg.minTime = parse_line(source.readline(), short, round_digits)
    tg.maxTime = parse_line(source.readline(), short, round_digits)
    source.readline()  # 'tiers? <exists>'
    if short:
        m = int(source.readline().strip())
    else:
        m = int(source.readline().strip().split()[2])
    if not short:
        source.readline()  # 'item []:'
    for _ in range(m):
        if not short:
            source.readline()  # 'item [n]:'
        if parse_line(source.readline(), short, round_digits) == "IntervalTier":
            name = parse_line(source.readline(), short, round_digits)
            imin = parse_line(source.readline(), short, round_digits)
            imax = parse_line(source.readline(), short, round_digits)
            tier = IntervalTier(name, imin, imax)
            tier.strict = tg.strict
            n = int(parse_line(source.readline(), short, round_digits))
            for _ in range(n):
                if not short:
                    source.readline()  # 'intervals [k]:'
                jmin = parse_line(source.readline(), short, round_digits)
                jmax = parse_line(source.readline(), short, round_digits)
                jmrk = get_mark(source, short)
                if jmin < jmax:
                    tier.addInterval(Interval(jmin, jmax, jmrk))
            tg.append(tier)
        else:
            name = parse_line(source.readline(), short, round_digits)
            imin = parse_line(source.readline(), short, round_digits)
            imax = parse_line(source.readline(), short, round_digits)
            tier = PointTier(name)
            n = int(parse_line(source.readline(), short, round_digits))
            for _ in range(n):
                source.readline()  # 'points [k]:'
                jtim = parse_line(source.readline(), short, round_digits)
                jmrk = get_mark(source, short)
                tier.addPoint(Point(jtim, jmrk))
            tg.append(tier)
    return tg
