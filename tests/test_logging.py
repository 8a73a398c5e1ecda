"""RunLogger sinks: CSV schema growth, json lines, tfevents framing."""

import json
import os
import struct

from osmosis_tpu.utils.logging import RunLogger


def test_csv_schema_expands_without_misalignment(tmp_path):
    lg = RunLogger(str(tmp_path))
    lg.logkv("a", 1)
    lg.dumpkvs()
    lg.logkv("a", 2)
    lg.logkv("b", 3)  # new key after the first row
    lg.dumpkvs()
    lg.logkv("b", 4)  # row missing 'a'
    lg.dumpkvs()
    lg.close()

    lines = open(os.path.join(str(tmp_path), "progress.csv")).read().splitlines()
    header = lines[0].split(",")
    assert header[:2] == ["a", "_time"] and "b" in header
    rows = [dict(zip(header, ln.split(","))) for ln in lines[1:]]
    assert rows[0]["a"] == "1" and rows[0].get("b", "") == ""
    assert rows[1]["a"] == "2" and rows[1]["b"] == "3"
    assert rows[2]["a"] == "" and rows[2]["b"] == "4"

    jlines = open(os.path.join(str(tmp_path), "progress.json")).read().splitlines()
    assert json.loads(jlines[1])["b"] == 3


def test_tensorboard_sink_writes_valid_tfrecord_framing(tmp_path):
    lg = RunLogger(str(tmp_path), format_strs=("log", "csv", "tensorboard"))
    lg.logkv("loss", 0.5)
    lg.logkv("note", "not-a-number")  # skipped by the scalar sink
    lg.dumpkvs()
    lg.logkv("loss", 0.25)
    lg.dumpkvs()
    lg.close()

    tb_dir = os.path.join(str(tmp_path), "tb")
    files = os.listdir(tb_dir)
    assert len(files) == 1 and files[0].startswith("events.out.tfevents.")
    data = open(os.path.join(tb_dir, files[0]), "rb").read()
    # walk the TFRecord framing: u64 len, u32 crc, payload, u32 crc
    off, n_events = 0, 0
    while off < len(data):
        (ln,) = struct.unpack_from("<Q", data, off)
        off += 12 + ln + 4
        n_events += 1
    assert off == len(data) and n_events == 2
