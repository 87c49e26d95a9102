"""Minimal xlsxwriter stand-in for running the REFERENCE program offline.

The reference (/root/reference/explore.py) imports `xlsxwriter` to emit its
Excel workbook; that library is not installed in this sandbox and the
workbook itself is not what we cross-validate (summary.json is). This shim
satisfies exactly the API surface explore.py touches — Workbook.add_format /
add_worksheet / close, Worksheet.write / write_formula / merge_range /
set_column / freeze_panes / insert_textbox / activate — and, instead of
producing a real xlsx, records every cell write per sheet and dumps them to
`<workbook path>.celldump.json` on close, so golden tests can diff the
reference's computed tab values against ours, not only its summary.json.

Used via `PYTHONPATH=tools/xlsxwriter_shim python3 .../explore.py -p <diag>`
(see GoldenReferenceSpec). This is test tooling, NOT part of the engine.
"""
import json


class _Worksheet(object):
    def __init__(self, name, book):
        self.name = name
        self._book = book
        self._cells = {}
        self._merges = []
        self._comments = {}

    @staticmethod
    def _key(row, col):
        # explore.py uses both numeric (row, col) and A1 ('G12') addressing
        if isinstance(row, str):
            return row
        return "%d,%d" % (row, col)

    def write(self, row, col=None, value=None, fmt=None):
        if isinstance(row, str):  # ('A1', value[, fmt]) — 2nd positional is the value
            self._cells[row] = col
        else:
            self._cells[self._key(row, col)] = value

    def write_formula(self, row, col=None, formula=None, fmt=None, result=None):
        if isinstance(row, str):  # ('G12', '=...'[, fmt])
            self._cells[row] = {"formula": col}
        else:
            self._cells[self._key(row, col)] = {"formula": formula}

    def merge_range(self, *args, **kwargs):
        # ('A1:C1', data, fmt) — record under the range's first cell,
        # and keep the RANGE itself so golden tests can diff the
        # engine's mergeCells part against the reference's merges
        if args and isinstance(args[0], str):
            self._cells[args[0].split(":")[0]] = args[1] if len(args) > 1 else None
            self._merges.append(args[0])

    def set_column(self, *a, **k):
        pass

    def write_comment(self, *a, **k):
        # ('C3', text, options) — recorded for the golden comment diff
        if a and isinstance(a[0], str):
            self._comments[a[0]] = a[1] if len(a) > 1 else None

    def freeze_panes(self, *a, **k):
        pass

    def insert_textbox(self, *a, **k):
        pass

    def activate(self):
        pass


class Workbook(object):
    def __init__(self, path, options=None):
        self._path = path
        self._sheets = []

    def add_worksheet(self, name=None):
        ws = _Worksheet(name or ("Sheet%d" % (len(self._sheets) + 1)), self)
        self._sheets.append(ws)
        return ws

    def add_format(self, props=None):
        return object()

    def close(self):
        # cell keys are 'r,c' or A1 refs, so the reserved __merges__ /
        # __comments__ keys can never collide with a real cell
        dump = {}
        for ws in self._sheets:
            d = dict(ws._cells)
            d["__merges__"] = ws._merges
            d["__comments__"] = ws._comments
            dump[ws.name] = d
        with open(self._path + ".celldump.json", "w") as f:
            # format objects or other opaque values degrade to null
            json.dump(dump, f, default=lambda o: None)
