"""CelebV-Text curated metadata + screening (data.celebv +
cli screen-videos): the reference's scripts/celev_info.py action tables
and scripts/celebv_screen_videos.py selection heuristics."""

import json

import numpy as np

from avi_talking_tpu.data.celebv import (
    SIGNIFICANT_ACTIONS,
    action_interval,
    filter_curated,
    get_actions,
    load_action_table,
    resolve_clip_id,
    screen_videos,
    strip_video_suffixes,
    video_to_action,
)


def test_packaged_action_table_matches_reference_counts():
    table = load_action_table()
    # the hand-curated head-dynamics subset (celev_info.py action_dict)
    assert {k: len(v) for k, v in table.items()} == {
        "nod": 127, "look_around": 89, "head_wagging": 162,
        "turn": 123, "shake_head": 140}
    assert sum(len(v) for v in table.values()) == 641
    v2a = video_to_action(table)
    # 76 ids are curated under more than one action; the inverted map
    # keeps the last action seen (get_vid_name2action dict semantics)
    assert len(v2a) == 565
    assert v2a["qrN4jhe7sHU_4_0"] == "nod"


def test_resolve_clip_id_dash_fixups():
    act = {"abc_1_0": [], "-def_2_0": [], "--ghi_3_0": []}
    assert resolve_clip_id(act, "abc_1_0") == "abc_1_0"
    # download artifacts: leading '_'/'-' stripped, then re-dashed 1-3x
    assert resolve_clip_id(act, "_abc_1_0") == "abc_1_0"
    assert resolve_clip_id(act, "def_2_0") == "-def_2_0"
    assert resolve_clip_id(act, "-ghi_3_0") == "--ghi_3_0"
    assert resolve_clip_id(act, "missing") is None
    ref, actions = get_actions({"x": [("nod", None)]}, "x")
    assert ref == "x" and actions == ["nod"]


def test_strip_video_suffixes_handles_stutter():
    assert strip_video_suffixes("/a/b/xyz_1_0.mp4") == "xyz_1_0"
    assert strip_video_suffixes("xyz_1_0.mp4.mp4") == "xyz_1_0"  # ref
    assert strip_video_suffixes("xyz_1_0.pkl") == "xyz_1_0"
    assert strip_video_suffixes("xyz_1_0") == "xyz_1_0"


def test_action_interval_math():
    # absolute 01:00:10 start, clip starts at 3600s -> 10s relative; 5s dur
    entry = ["nod", ("01:00:10", None, 5)]
    clip = {"duration": {"start_sec": 3600, "end_sec": 3660}}
    assert action_interval(entry, clip) == (10, 15)
    # clamp at 0 when the action starts before the clip window
    entry2 = ["nod", ("00:59:50", None, 4)]
    assert action_interval(entry2, clip) == (0, 4)


def test_screen_videos_quota_and_skips(capsys):
    act = {
        "a_1_0": [["nod", ("00:00:01", None, 2)],
                  ["talk", ("00:00:00", None, 9)]],  # talk: insignificant
        "b_1_0": [["nod", ("00:00:03", None, 1)]],
        "c_1_0": [["smile", ("00:00:00", None, 2)]],
        "noinfo": [["nod", ("00:00:00", None, 1)]],
    }
    clips = {f"{k}.mp4": {"duration": {"start_sec": 0, "end_sec": 10}}
             for k in ("a_1_0", "b_1_0", "c_1_0")}
    names = ["a_1_0.mp4", "b_1_0.mp4", "c_1_0.mp4", "noinfo.mp4",
             "unknown.mp4"]
    rows = screen_videos(names, act, clips, max_per_action=1)
    got = {(r["id"], r["action"]) for r in rows}
    # nod quota = 1: a_1_0 takes it, b_1_0's nod is the over-quota entry
    # (the reference removes the action AFTER the exceeding selection, so
    # the exceeding one is still emitted; later ones are not)
    assert ("a_1_0", "nod") in got and ("b_1_0", "nod") in got
    assert ("c_1_0", "smile") in got
    assert not any(r["action"] == "talk" for r in rows)
    a_row = next(r for r in rows if r["id"] == "a_1_0")
    assert (a_row["start_sec"], a_row["end_sec"]) == (1, 3)
    err = capsys.readouterr().out
    assert "no clip info for noinfo" in err
    assert "no annotation for unknown" in err
    assert "talk" not in SIGNIFICANT_ACTIONS


def test_filter_curated():
    pairs = filter_curated(["qrN4jhe7sHU_4_0.mp4", "nope.mp4"])
    assert pairs == [("qrN4jhe7sHU_4_0.mp4", "nod")]


def test_screen_videos_cli(tmp_path):
    from avi_talking_tpu.cli import main

    names = tmp_path / "names.txt"
    names.write_text("a_1_0.mp4\nb_1_0.mp4\n")
    ann = {"act": {"a_1_0": [["nod", ["00:00:01", None, 2]]],
                   "b_1_0": [["talk", ["00:00:00", None, 3]]]}}
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    (tmp_path / "info.json").write_text(json.dumps({
        "a_1_0.mp4": {"duration": {"start_sec": 0, "end_sec": 9}},
        "b_1_0.mp4": {"duration": {"start_sec": 0, "end_sec": 9}}}))
    out = tmp_path / "sel.json"
    rc = main(["screen-videos", "--src", str(names), "--out", str(out),
               "--annotations", str(tmp_path / "ann.json"),
               "--clip-info", str(tmp_path / "info.json")])
    assert rc == 0
    rows = json.loads(out.read_text())
    assert rows == [{"video": "a_1_0.mp4", "id": "a_1_0", "action": "nod",
                     "start_sec": 1, "end_sec": 3}]
    # curated mode over a directory listing
    vdir = tmp_path / "vids"
    vdir.mkdir()
    (vdir / "qrN4jhe7sHU_4_0.mp4").write_bytes(b"x")
    (vdir / "zz.mp4").write_bytes(b"x")
    out2 = tmp_path / "cur.json"
    rc = main(["screen-videos", "--src", str(vdir), "--out", str(out2),
               "--curated"])
    assert rc == 0
    assert json.loads(out2.read_text()) == [
        {"video": "qrN4jhe7sHU_4_0.mp4", "action": "nod"}]
