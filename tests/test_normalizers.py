"""Unit tests for per-type id normalization (reference semantics
/root/reference/data/pubtator.py:96-278; see each fn's docstring)."""

from bio_re_with_entity_embeddings_ray.functions import normalize as nz


def test_default_drops_star_prefixed():
    assert nz.normalize_default("*123") == []
    assert nz.normalize_default("") == []
    assert nz.normalize_default("X:1") == ["X:1"]


def test_chemical_keeps_mesh_only():
    assert nz.normalize_chemical("MESH:D0001") == ["MESH:D0001"]
    assert nz.normalize_chemical("CHEBI:1") == []


def test_cellline_strips_suffix_and_returns_list():
    # intended semantics of data/pubtator.py:140-151 (reference returns a
    # bare str and the caller iterates characters — bug not replicated)
    assert nz.normalize_cellline("CVCL_0030;junk") == ["CVCL_0030"]
    assert nz.normalize_cellline("cvcl_77") == ["cvcl_77"]
    assert nz.normalize_cellline("ATCC-1") == []


def test_drug_mapping_one_to_many_and_drop_unmapped():
    fn = nz.make_normalize_drug({"MESH:D1": "DB1|DB2", "MESH:D2": "DB9"})
    assert fn("MESH:D1;suffix") == ["DB1", "DB2"]
    assert fn("MESH:D2") == ["DB9"]
    assert fn("MESH:D404") == []
    assert fn("OMIM:1") == []


def test_disease_prefixes_and_optional_doid_remap():
    plain = nz.make_normalize_disease(None)
    assert plain("MESH:D6;x") == ["MESH:D6"]
    assert plain("OMIM:104300") == ["OMIM:104300"]
    assert plain("XYZ:1") == []
    remap = nz.make_normalize_disease({"MESH:D6": "DOID:2|DOID:1"})
    assert remap("MESH:D6") == ["DOID:1", "DOID:2"]  # sorted set
    assert remap("MESH:D7") == []


def test_gene_split_and_prefix():
    assert nz.normalize_gene("672;675") == ["NCBI:672", "NCBI:675"]
    assert nz.normalize_gene("None") == []
    assert nz.normalize_gene("") == []


def test_mutation_rs_extraction():
    assert nz.normalize_mutation("RS#:1,2") == ["rs1", "rs2"]
    assert nz.normalize_mutation("RS#:121(Expired)") == ["rs121"]
    assert nz.normalize_mutation("HGVS:c.1A>G") == []
    assert nz.normalize_mutation("CorrespondingGene:673;RS#:5") == ["rs5"]


def test_species_strip_star_prefix():
    assert nz.normalize_species("*9606") == ["TAXON:9606"]
    assert nz.normalize_species("10090") == ["TAXON:10090"]
