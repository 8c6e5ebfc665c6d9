"""K5 CLI wrapper: argument surface + exit-code contract (MainTest.java).

Exit codes follow picocli's contract (Main.java:252-256): 0 success,
2 usage/validation error, 1 runtime failure.
"""

from __future__ import annotations

import io

from solarpos_spark import cli


def run(spark, *argv) -> tuple[int, str]:
    out = io.StringIO()
    code = cli.main(list(argv), spark=spark, out=out)
    return code, out.getvalue()


class TestExitCodes:
    def test_version(self, spark):
        code, out = run(spark, "-V")
        assert code == 0
        assert "solarpos" in out  # MainTest.version

    def test_rejects_bad_dates(self, spark):
        # MainTest.rejectsBadDates: "20", "99999", "2024-12-32"
        for bad in ("20", "99999", "2024-12-32"):
            code, _ = run(spark, "25", "50", bad, "position")
            assert code != 0, bad

    def test_rejects_bad_coords(self, spark):
        # MainTest.rejectsBadCoords: lat 91 / lon 200 with year input
        assert run(spark, "91", "0", "2023", "position")[0] != 0
        assert run(spark, "0", "200", "2023", "position")[0] != 0

    def test_rejects_bad_step(self, spark):
        # PositionTest.rejectsInvalidStepValues: 0.1 and 999999 seconds
        assert run(spark, "52", "25", "2003", "position", "--step=0.1")[0] != 0
        assert run(spark, "52", "25", "2003", "position",
                   "--step=999999")[0] != 0

    def test_unknown_command(self, spark):
        assert run(spark, "52", "25", "2023", "noodle")[0] == 2


class TestOutputs:
    def test_csv_default_has_headers(self, spark):
        # PositionTest.csvDefaultHasHeaders golden
        code, out = run(spark, "52.0", "25.0", "2003-10-17T12:00:00Z",
                        "--format=csv", "--deltat=69", "position")
        assert code == 0
        lines = out.splitlines()
        assert lines[0] == "dateTime,azimuth,zenith"
        assert lines[1] == "2003-10-17T12:00:00Z,211.20726,65.92499"

    def test_csv_no_headers_show_inputs(self, spark):
        # PositionTest basicUsageWithCsv row shape (single row golden)
        code, out = run(spark, "52.0", "25.0", "2003-10-17T12:00:00Z",
                        "--format=csv", "--no-headers", "--deltat=69",
                        "--show-inputs", "position")
        assert code == 0
        assert out == ("52.00000,25.00000,0.000,1013.000,15.000,"
                       "2003-10-17T12:00:00Z,69.000,211.20726,65.92499\r\n")

    def test_deltat_bare_estimates(self, spark):
        # --deltat with no value -> Espenak-Meeus estimate (Main.java:117-126)
        code, out = run(spark, "52.0", "25.0", "2003-10-17T12:00:00Z",
                        "--format=json", "--deltat", "--show-inputs",
                        "position")
        assert code == 0
        import json

        obj = json.loads(out)
        assert 64.0 < obj["deltaT"] < 66.0  # ~64.8 s for 2003

    def test_json_golden(self, spark):
        code, out = run(spark, "52.0", "25.0", "2022-10-17T12:00:00Z",
                        "--format=json", "--deltat=69", "position")
        import json

        obj = json.loads(out)
        assert obj["azimuth"] == 211.17614
        assert obj["zenith"] == 66.06832

    def test_sunrise_human(self, spark):
        # SunriseTest.humanFormatOutput fragments
        code, out = run(spark, "52.0", "25.0", "2022-10-17T12:00:00Z",
                        "--format=human", "--deltat=69", "--show-inputs",
                        "sunrise")
        assert code == 0
        for frag in ("52.00000°", "date/time", "delta T", "normal",
                     "2022-10-17 04:47:51Z", "2022-10-17 10:05:21Z",
                     "2022-10-17 15:22:00Z", "69.000 s"):
            assert frag in out, frag

    def test_year_series_row_count(self, spark):
        # PositionTest fullYear: 2003 at 2h steps -> 4380 rows
        code, out = run(spark, "52.0", "25.0", "2003", "--format=csv",
                        "--no-headers", "--deltat=69", "--timezone=UTC",
                        "position", "--step=2h")
        assert code == 0
        lines = out.splitlines()
        assert len(lines) == 4380
        assert lines[0].split(",")[5] == "2003-01-01T00:00:00Z"
        assert lines[-1].split(",")[5] == "2003-12-31T22:00:00Z"

    def test_named_zone_series(self, spark):
        # DST-aware series through the CLI: Berlin Feb 2024 at 2h steps
        code, out = run(spark, "52.0", "25.0", "2024-02", "--format=csv",
                        "--no-headers", "--deltat=69",
                        "--timezone=Europe/Berlin", "position", "--step=2h")
        assert code == 0
        lines = out.splitlines()
        assert len(lines) == 29 * 12
        assert lines[0].split(",")[5] == "2024-02-01T00:00:00+01:00"

    def test_paired_file(self, spark, tmp_path):
        # MainTest.supportsPairedDataFiles
        f = tmp_path / "paired.txt"
        f.write_text("25.0 50.0 2023-06-21T12:00\n")
        code, out = run(spark, f"@{f}", "position")
        assert code == 0
        assert "2023-06-21" in out
        assert "azimuth" in out and "zenith" in out

    def test_grena3_flag(self, spark):
        code, out = run(spark, "52.0", "25.0", "2022-10-17T12:00:00Z",
                        "--format=csv", "--no-headers", "--deltat=69",
                        "position", "--algorithm=grena3")
        assert code == 0
        assert out.strip() == "2022-10-17T12:00:00Z,211.17436,66.06850"

    def test_elevation_angle_flag(self, spark):
        code, out = run(spark, "52.0", "25.0", "2003-10-17T12:00:00Z",
                        "--format=csv", "--deltat=69", "position",
                        "--elevation-angle")
        lines = out.splitlines()
        assert lines[0] == "dateTime,azimuth,elevation-angle"
        assert lines[1].endswith(f",{90 - 65.92499:.5f}")


class TestStdinAndFileQuirks:
    """@- stdin (Main.java:27,52,76; DateTimeIterator.java:223-229) and the
    @coordFile+now -> PairedData quirk (Main.createCoordinateFileMode)."""

    def test_stdin_paired(self, spark, monkeypatch):
        # echo '52.0 13.4 2024-01-01T12:00:00' | solarpos @- position
        import io as _io

        monkeypatch.setattr("sys.stdin",
                            _io.StringIO("25.0 50.0 2023-06-21T12:00\n"))
        code, out = run(spark, "@-", "--format=csv", "--deltat=69",
                        "position")
        assert code == 0
        assert "2023-06-21T12:00:00Z" in out

    def test_stdin_time_file(self, spark, monkeypatch):
        import io as _io

        monkeypatch.setattr(
            "sys.stdin",
            _io.StringIO("2023-06-21T12:00\n2023-06-21T13:00\n"))
        code, out = run(spark, "52.0", "25.0", "@-", "--format=csv",
                        "--no-headers", "--deltat=69", "position")
        assert code == 0
        rows = [ln for ln in out.splitlines() if ln]
        assert len(rows) == 2

    def test_coord_file_with_now_is_paired(self, spark, tmp_path):
        # reference: @coords.txt + "now" dispatches to PairedData, so the
        # file must carry lat lon datetime triples and 'now' is a dummy
        f = tmp_path / "data.txt"
        f.write_text("25.0 50.0 2023-06-21T12:00\n30.0 60.0 2023-06-21T13:00\n")
        code, out = run(spark, f"@{f}", "now", "--format=csv",
                        "--no-headers", "--deltat=69", "position")
        assert code == 0
        rows = [ln for ln in out.splitlines() if ln]
        assert len(rows) == 2  # 1:1 pairing, no cartesian expansion

    def test_double_stdin_rejected(self, spark):
        # Main.validateStdinUsage: "Cannot use stdin (@-) for multiple inputs"
        code, _ = run(spark, "@-", "@-", "position")
        assert code == 2

    def test_stdin_coordinates(self, spark, monkeypatch):
        # StdinTest.supportsStdinForCoordinates
        import io as _io

        monkeypatch.setattr("sys.stdin", _io.StringIO("52.0 25.0\n48.8 2.3\n"))
        code, out = run(spark, "@-", "2023-06-21T12:00:00", "--format=csv",
                        "--no-headers", "--deltat=69", "position")
        assert code == 0
        rows = [ln for ln in out.splitlines() if ln]
        assert len(rows) == 2

    def test_stdin_comments_and_blanks(self, spark, monkeypatch):
        # StdinTest.supportsCommentsAndBlankLinesInStdin
        import io as _io

        monkeypatch.setattr("sys.stdin", _io.StringIO(
            "# comment\n52.0,25.0,2023-06-21T12:00\n\n# another\n"
            "48.8,2.3,2023-06-21T14:00\n"))
        code, out = run(spark, "@-", "--format=csv", "--no-headers",
                        "--deltat=69", "position")
        assert code == 0
        assert len([ln for ln in out.splitlines() if ln]) == 2

    def test_stdin_invalid_data_fails(self, spark, monkeypatch):
        # StdinTest.handlesInvalidStdinData -> non-zero exit
        import io as _io

        monkeypatch.setattr("sys.stdin", _io.StringIO("invalid data format\n"))
        code, _ = run(spark, "@-", "position")
        assert code != 0

    def test_stdin_sunrise(self, spark, monkeypatch):
        # StdinTest.worksWithSunriseCommand
        import io as _io

        monkeypatch.setattr("sys.stdin",
                            _io.StringIO("52.0,25.0,2023-06-21T12:00\n"))
        code, out = run(spark, "@-", "sunrise")
        assert code == 0
        assert "sunrise" in out


class TestConverterParity:
    """DateTimeConverter time-only inputs + DurationConverter ISO-8601 steps."""

    def test_time_only_input_uses_today(self, spark, monkeypatch):
        # DateTimeConverterTest time-only cases; clock fixed via the test
        # hook mirroring solarpos.test.clock (DateTimeConverter.java:17-25)
        monkeypatch.setenv("SOLARPOS_TEST_CLOCK", "2003-10-17T00:30:00+00:00")
        code, out = run(spark, "52.0", "25.0", "12:00:00", "--format=csv",
                        "--no-headers", "--deltat=69", "position")
        assert code == 0
        assert out.splitlines()[0].startswith("2003-10-17T12:00:00Z")

    def test_time_only_with_offset(self, spark, monkeypatch):
        monkeypatch.setenv("SOLARPOS_TEST_CLOCK", "2003-10-17T12:00:00+00:00")
        code, out = run(spark, "52.0", "25.0", "13:00:00+01:00",
                        "--format=csv", "--no-headers", "--deltat=69",
                        "position")
        assert code == 0
        # 13:00+01:00 == 12:00Z -> the 2003-10-17T12:00Z golden azimuth
        assert "211.20726" in out

    def test_iso_duration_step(self, spark):
        # DurationConverterTest: PT1H == 1h == 3600
        code_a, out_a = run(spark, "52.0", "25.0", "2024-01-01",
                            "--format=csv", "--no-headers", "--deltat=69",
                            "position", "--step=PT1H")
        code_b, out_b = run(spark, "52.0", "25.0", "2024-01-01",
                            "--format=csv", "--no-headers", "--deltat=69",
                            "position", "--step=1h")
        assert code_a == code_b == 0
        assert out_a == out_b
        assert len(out_a.splitlines()) == 24

    def test_iso_duration_day_step_rejected_above_max(self, spark):
        # DurationConverter MAX_STEP = 1 day -> P2D must be rejected
        assert run(spark, "52.0", "25.0", "2024", "position",
                   "--step=P2D")[0] != 0

    def test_help_command(self, spark):
        # positional 'help' (Main.COMMANDS) -> usage text, exit 0
        code, out = run(spark, "help")
        assert code == 0 and "usage" in out.lower()

    def test_time_patterns(self, spark, monkeypatch):
        # PositionTest.timePatterns: all accepted offset-time forms resolve
        # to today's date at that wall time + offset
        monkeypatch.setenv("SOLARPOS_TEST_CLOCK", "2003-10-17T06:00:00+00:00")
        for t in ("12:00:00Z", "12:00:00+00:00", "12:00:00.000+00:00",
                  "12:00Z"):
            code, out = run(spark, "52.0", "25.0", t, "--format=csv",
                            "--no-headers", "--deltat=69", "position")
            assert code == 0, t
            assert out.splitlines()[0].startswith("2003-10-17T12:00:00Z"), t


class TestNegativeCoordinates:
    def test_negative_coordinates(self, spark):
        # PositionTest.negativeCoordinates (Buenos Aires, -03:00 offset)
        code, out = run(spark, "-34.6118", "-58.3960",
                        "2022-10-17T12:00:00-03:00", "--format=csv",
                        "--deltat=69", "--show-inputs", "position")
        assert code == 0
        row = out.splitlines()[1].split(",")
        assert row[0] == "-34.61180" and row[1] == "-58.39600"
        az, zen = float(row[-2]), float(row[-1])
        assert 0 <= az <= 360 and 0 <= zen <= 180

    def test_negative_coordinate_range(self, spark):
        # PositionTest.negativeCoordinateRange
        code, out = run(spark, "--format=csv", "--no-headers", "45.0",
                        "-10.0:-5.0:1.0", "2024-06-21T12:00", "position")
        assert code == 0
        for lon in ("-10.00000", "-9.00000", "-8.00000", "-7.00000",
                    "-6.00000", "-5.00000"):
            assert lon in out, lon


class TestSunriseDailyIteration:
    """SunriseCommand always iterates Duration.ofDays(1) — no --step
    (SunriseCommand.java:84)."""

    def test_polar_nights_csv(self, spark):
        # SunriseTest.polarNightsCsv: Feb 2023 at Svalbard -> 28 daily rows,
        # first sunrise empty (polar night), Feb 28 sunrise golden
        code, out = run(spark, "78.22", "15.63", "2023-02", "--format=csv",
                        "--timezone=UTC", "sunrise")
        assert code == 0
        lines = out.splitlines()
        hdr = lines[0].split(",")
        rows = [ln.split(",") for ln in lines[1:]]
        assert len(rows) == 28
        i = hdr.index("sunrise")
        assert rows[0][i] == ""
        assert rows[27][i] == "2023-02-28T07:38:45Z"

    def test_full_year_csv(self, spark):
        # SunriseTest.fullYearWithCsv: 365 daily rows
        code, out = run(spark, "52.0", "25.0", "2023", "--format=csv",
                        "--timezone=UTC", "sunrise")
        assert code == 0
        assert len(out.splitlines()) - 1 == 365


class TestCoordFileTimeFile:
    def test_coords_file_times_file_cartesian(self, spark, tmp_path):
        """Main.java:25's documented example `solarpos @coords.txt
        @times.txt position` — implemented as the cartesian the example
        describes (the reference's converter silently ignores the time
        file, DateTimeConverter.java:104-107)."""
        cf = tmp_path / "coords.txt"
        cf.write_text("52.0 13.4\n48.8 2.3\n-34.6 -58.4\n")
        tf = tmp_path / "times.txt"
        tf.write_text("2023-06-21T12:00\n2023-06-21T18:00\n")
        code, out = run(spark, f"@{cf}", f"@{tf}", "--format=csv",
                        "--no-headers", "--deltat=69", "position")
        assert code == 0
        rows = [ln for ln in out.splitlines() if ln]
        assert len(rows) == 6  # 3 coords x 2 times

    def test_coords_file_stdin_times(self, spark, tmp_path, monkeypatch):
        import io as _io

        cf = tmp_path / "coords.txt"
        cf.write_text("52.0 13.4\n48.8 2.3\n")
        monkeypatch.setattr("sys.stdin", _io.StringIO("2023-06-21T12:00\n"))
        code, out = run(spark, f"@{cf}", "@-", "--format=csv",
                        "--no-headers", "--deltat=69", "position")
        assert code == 0
        assert len([ln for ln in out.splitlines() if ln]) == 2

    def test_case_insensitive_enum_values(self, spark):
        # Main.createCommandLine setCaseInsensitiveEnumValuesAllowed(true)
        code, out = run(spark, "52.0", "25.0", "2022-10-17T12:00:00Z",
                        "--format=CSV", "--no-headers", "--deltat=69",
                        "position", "--algorithm=GRENA3")
        assert code == 0
        assert out.strip() == "2022-10-17T12:00:00Z,211.17436,66.06850"


class TestTimezoneOffsets:
    """--timezone accepts bare offsets like ZoneId.of, and event times
    render in the input's offset (SunriseTest.java:33-69)."""

    def test_sunrise_twilight_offset_goldens(self, spark):
        import json as _json

        code, out = run(spark, "52.49", "-1.89", "2023-05-01",
                        "--timezone=+01:00", "--deltat=69", "--show-inputs",
                        "--format=json", "sunrise", "--twilight")
        assert code == 0
        row = _json.loads(out.splitlines()[0])
        assert row["dateTime"] == "2023-05-01T00:00:00+01:00"
        assert row["sunrise"] == "2023-05-01T05:36:58+01:00"
        assert row["sunset"] == "2023-05-01T20:33:32+01:00"
        assert row["civil_start"] == "2023-05-01T04:57:41+01:00"
        assert row["civil_end"] == "2023-05-01T21:13:05+01:00"
        assert row["nautical_start"] == "2023-05-01T04:06:25+01:00"
        assert row["nautical_end"] == "2023-05-01T22:04:53+01:00"
        assert row["astronomical_start"] == "2023-05-01T03:01:18+01:00"
        # the former 1-second edge, exact since the zoned-midnight A.2
        # anchor fix (kernels/sunrise.py docstring)
        assert row["astronomical_end"] == "2023-05-01T23:11:26+01:00"

    def test_position_instant_renders_input_offset(self, spark):
        code, out = run(spark, "52.0", "25.0", "2024-01-01T12:00+01:00",
                        "--format=csv", "--no-headers", "--deltat=69",
                        "position")
        assert code == 0
        assert out.startswith("2024-01-01T12:00:00+01:00,")

    def test_times_file_preserves_offsets(self, spark, tmp_path):
        tf = tmp_path / "t.txt"
        tf.write_text("2023-06-21T12:00:00+02:00\n2023-06-21T12:00:00Z\n")
        code, out = run(spark, "52.0", "13.4", f"@{tf}", "--format=csv",
                        "--no-headers", "--deltat=69", "position")
        assert code == 0
        rows = sorted(ln.split(",")[5] for ln in out.splitlines() if ln)
        assert rows == ["2023-06-21T12:00:00+02:00", "2023-06-21T12:00:00Z"]

    def test_series_with_offset_timezone(self, spark):
        # month series under a bare-offset zone: starts at local midnight,
        # rendered in that offset
        code, out = run(spark, "52.0", "25.0", "2024-02", "--format=csv",
                        "--no-headers", "--deltat=69", "--timezone=+01:00",
                        "position", "--step=2h")
        assert code == 0
        lines = [ln for ln in out.splitlines() if ln]
        assert len(lines) == 29 * 12
        assert lines[0].split(",")[5] == "2024-02-01T00:00:00+01:00"


class TestPerfFlag:
    def test_perf_prints_stats_to_stderr(self, spark, capsys):
        # PerformanceTracker.printStats: "Performance: N values in S
        # seconds (R/s)" on stderr; stdout stays clean CSV
        import re

        code, out = run(spark, "52.0", "25.0", "2024", "--step=6h",
                        "--format=csv", "--no-headers", "--deltat=69",
                        "--perf", "position")
        assert code == 0
        err = capsys.readouterr().err
        m = re.search(
            r"Performance: (\d+) values in \d+\.\d{3} seconds \(\d+/s\)",
            err)
        assert m, err
        assert int(m.group(1)) == out.count("\r\n") == 1464  # 366 * 4

    def test_no_perf_flag_no_stats(self, spark, capsys):
        code, _ = run(spark, "52.0", "25.0", "2024-06-01T12:00:00Z",
                      "--format=csv", "--deltat=69", "position")
        assert code == 0
        assert "Performance:" not in capsys.readouterr().err
