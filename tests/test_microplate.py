import pytest

from arcadia_microscopy_tools_tpu.microplate import MicroplateLayout, Well


class TestWell:
    def test_well_creation(self):
        well = Well(id="A01", sample="sample1")
        assert well.id == "A01"
        assert well.sample == "sample1"
        assert well.row == "A"
        assert well.column == 1

    def test_well_id_normalization(self):
        well = Well(id="a1")
        assert well.id == "A01"

    def test_well_invalid_id(self):
        with pytest.raises(ValueError, match="Well ID must be at least 2 characters"):
            Well(id="A")

    def test_well_invalid_row(self):
        with pytest.raises(ValueError, match="Row must be A-Z"):
            Well(id="901")

    def test_well_invalid_column(self):
        with pytest.raises(ValueError, match="Column must be 1-48"):
            Well(id="A49")

    def test_well_from_dict(self):
        data = {"well_id": "B02", "sample": "test_sample", "concentration": 10}
        well = Well.from_dict(data)
        assert well.id == "B02"
        assert well.sample == "test_sample"
        assert well.properties["concentration"] == 10

    def test_well_from_dict_missing_id(self):
        with pytest.raises(ValueError, match="well_id"):
            Well.from_dict({"sample": "x"})


class TestMicroplateLayout:
    def test_layout_creation(self):
        wells = [Well(id="A01", sample="s1"), Well(id="B02", sample="s2")]
        layout = MicroplateLayout(wells)
        assert len(layout) == 2
        assert "A01" in layout
        assert "B02" in layout

    def test_layout_getitem(self):
        wells = [Well(id="A01", sample="s1")]
        layout = MicroplateLayout(wells)
        assert layout["A01"].sample == "s1"
        # non-normalized lookups work
        assert layout["a1"].sample == "s1"

    def test_layout_missing_key(self):
        layout = MicroplateLayout([Well(id="A01")])
        with pytest.raises(KeyError):
            layout["B01"]

    def test_layout_duplicate_wells(self):
        wells = [Well(id="A01", sample="s1"), Well(id="A01", sample="s2")]
        with pytest.raises(ValueError, match="Duplicate well ID"):
            MicroplateLayout(wells)

    def test_layout_to_dataframe(self):
        wells = [Well(id="A01", sample="s1"), Well(id="B02", sample="s2")]
        layout = MicroplateLayout(wells)
        df = layout.to_dataframe()
        assert len(df) == 2
        assert "well_id" in df.columns
        assert "sample" in df.columns

    def test_csv_round_trip(self, tmp_path):
        csv = tmp_path / "plate.csv"
        csv.write_text("well_id,sample,dose\nA01,ctrl,0\nB02,drug,10\n")
        layout = MicroplateLayout.from_csv(csv)
        assert len(layout) == 2
        assert layout["B02"].properties["dose"] == 10
        df = layout.to_dataframe()
        assert set(df["well_id"]) == {"A01", "B02"}

    def test_display(self):
        layout = MicroplateLayout([Well(id="A01", sample="x"), Well(id="B02", sample="y")])
        out = layout.display()
        assert "x" in out and "y" in out

    def test_rows_columns(self):
        layout = MicroplateLayout([Well(id="A01"), Well(id="B02"), Well(id="A03")])
        assert layout.rows == ["A", "B"]
        assert layout.columns == [1, 2, 3]
