"""Deterministic synthetic medical ontology (replaces live UMLS/MedGen/UniProt).

All data below is fixed, seed-free constant data mirroring the *shapes* of the
reference's external databases (FIXTURES.md §2):

- ``CONCEPTS``: UMLS-concept analogue (entityrecognition.py:110-112 lookups)
- ``ALIASES``: entity-linking alias index (N2/N4); includes ambiguous aliases
  (one surface form -> 2 CUIs) to exercise disambiguation + connected
  components, abbreviations (``pku``) for the Schwartz-Hearst path, and three
  "hot" chemical CUIs that the corpus generator over-samples 100x to exercise
  skew handling.
- ``MEDGEN``: CUI -> genes/snomed/clinical_features (medgen.py:165-212 shapes)
- ``UNIPROT``: gene -> protein/GO rows (uniprotpipe.py:65-146 shapes), with a
  parenthetical protein name (split at '(', uniprotpipe.py:77), a
  synonym-only gene to exercise the substring theta-join fallback
  (uniprotpipe.py:70-73), a malformed GO segment (skip path,
  uniprotpipe.py:135-136) and empty GO cells (fillna, uniprotpipe.py:126).

The reference test fixture pairs C0031485->PAH and C0268465->QDPR
(tests/unittests/conftest.py:22-26) are preserved verbatim.
"""

from __future__ import annotations

# (CUI, canonical_name, definition, semtype)
CONCEPTS: list[tuple[str, str, str, str]] = [
    ("C0031485", "Phenylketonuria", "A metabolic disorder of phenylalanine hydroxylation.", "DISEASE"),
    ("C0268465", "Dihydropteridine reductase deficiency", "A disorder of tetrahydrobiopterin regeneration.", "DISEASE"),
    ("C0020550", "Hyperthyroidism", "Overproduction of thyroid hormone.", "DISEASE"),
    ("C0014544", "Epilepsy", "A brain disorder with recurrent seizures.", "DISEASE"),
    ("C0036572", "Seizure", "A sudden surge of electrical activity in the brain.", "DISEASE"),
    ("C0011849", "Diabetes mellitus", "A metabolic disease with high blood sugar.", "DISEASE"),
    ("C0020538", "Hypertension", "Persistently elevated arterial blood pressure.", "DISEASE"),
    ("C0004096", "Asthma", "A chronic inflammatory disease of the airways.", "DISEASE"),
    ("C0027051", "Myocardial infarction", "Necrosis of heart muscle from ischemia.", "DISEASE"),
    ("C0036341", "Schizophrenia", "A chronic psychiatric disorder.", "DISEASE"),
    ("C0004057", "Aspirin", "A salicylate analgesic and antiplatelet agent.", "CHEMICAL"),
    ("C0020740", "Ibuprofen", "A nonsteroidal anti-inflammatory drug.", "CHEMICAL"),
    ("C0030358", "Paracetamol", "An analgesic and antipyretic agent.", "CHEMICAL"),
    ("C0025598", "Methotrexate", "An antimetabolite and antifolate drug.", "CHEMICAL"),
    ("C0026259", "Mitoxantrone", "An anthracenedione antineoplastic agent.", "CHEMICAL"),
    ("C0016860", "Phenylalanine", "An essential aromatic amino acid.", "CHEMICAL"),
    ("C0040165", "Thyroxine", "The main hormone secreted by the thyroid.", "CHEMICAL"),
    ("C0042866", "Valproate", "An anticonvulsant fatty-acid derivative.", "CHEMICAL"),
    ("C0006982", "Carbamazepine", "An anticonvulsant and mood stabilizer.", "CHEMICAL"),
    ("C0002100", "Mesalamine", "An anti-inflammatory aminosalicylate.", "CHEMICAL"),
]

# (alias, CUI, is_canonical); aliases are lower-case surface forms.
# 'mtx' and 'asa' are AMBIGUOUS (two CUIs each) -> alias-cluster edges for
# connected-components canonicalization (north_rule).
ALIASES: list[tuple[str, str, bool]] = [
    ("phenylketonuria", "C0031485", True),
    ("phenylketonurie", "C0031485", False),
    ("folling disease", "C0031485", False),
    ("pku", "C0031485", False),
    ("dihydropteridine reductase deficiency", "C0268465", True),
    ("dhpr deficiency", "C0268465", False),
    ("hyperthyroidism", "C0020550", True),
    ("overactive thyroid", "C0020550", False),
    ("thyrotoxicosis", "C0020550", False),
    ("epilepsy", "C0014544", True),
    ("seizure disorder", "C0014544", False),
    ("falling sickness", "C0014544", False),
    ("seizure", "C0036572", True),
    ("convulsion", "C0036572", False),
    ("diabetes mellitus", "C0011849", True),
    ("diabetes", "C0011849", False),
    ("hypertension", "C0020538", True),
    ("high blood pressure", "C0020538", False),
    ("asthma", "C0004096", True),
    ("myocardial infarction", "C0027051", True),
    ("heart attack", "C0027051", False),
    ("schizophrenia", "C0036341", True),
    ("aspirin", "C0004057", True),
    ("acetylsalicylic acid", "C0004057", False),
    ("asa", "C0004057", False),
    ("asa", "C0002100", False),          # ambiguous
    ("ibuprofen", "C0020740", True),
    ("paracetamol", "C0030358", True),
    ("acetaminophen", "C0030358", False),
    ("methotrexate", "C0025598", True),
    ("mtx", "C0025598", False),
    ("mtx", "C0026259", False),          # ambiguous
    ("mitoxantrone", "C0026259", True),
    ("phenylalanine", "C0016860", True),
    ("phe", "C0016860", False),
    ("thyroxine", "C0040165", True),
    ("valproate", "C0042866", True),
    ("valproic acid", "C0042866", False),
    ("carbamazepine", "C0006982", True),
    ("levetiracetam", "C0006982", False),  # deliberate spelling-distant alias
    ("mesalamine", "C0002100", True),
]

# Hot CUIs oversampled ~100x in the corpus (skew / salting exercise).
HOT_ALIASES = ["aspirin", "ibuprofen", "paracetamol"]

# CUI -> genes / snomed structs / clinical features (MEDGEN analogue).
MEDGEN: dict[str, dict] = {
    "C0031485": {
        "genes": ["PAH"],
        "snomed": [("S0001001", "phenylketonuria", "SC26482002", "SNOMEDCT_US")],
        "clinical_features": [
            ("C0557874", "Finding", "Global developmental delay", "Delayed milestones."),
            ("C0023380", "Finding", "Eczema", ""),
        ],
    },
    "C0268465": {
        "genes": ["QDPR"],
        "snomed": [("S0001002", "hyperphenylalaninemia due to dhpr deficiency", "SC58256000", "SNOMEDCT_US")],
        "clinical_features": [("C0026826", "Finding", "Muscular hypotonia", "Low muscle tone.")],
    },
    "C0020550": {
        "genes": ["TSHR", "TPO", "LR3"],
        "snomed": [
            ("S0001003", "hyperthyroidism", "SC34486009", "SNOMEDCT_US"),
            ("S0001004", "thyrotoxicosis", "SC90739004", "SNOMEDCT_US"),
        ],
        "clinical_features": [("C0039231", "Finding", "Tachycardia", "Fast heart rate.")],
    },
    "C0014544": {
        "genes": ["SCN1A", "DEPDC5"],
        "snomed": [("S0001005", "epilepsy", "SC84757009", "SNOMEDCT_US")],
        "clinical_features": [("C0036572", "Finding", "Seizure", "")],
    },
    "C0036572": {
        "genes": ["SCN1A"],
        "snomed": [("S0001006", "seizure", "SC91175000", "SNOMEDCT_US")],
        "clinical_features": [],
    },
    "C0011849": {
        "genes": ["INS", "INSR"],
        "snomed": [("S0001007", "diabetes mellitus", "SC73211009", "SNOMEDCT_US")],
        "clinical_features": [("C0032617", "Finding", "Polyuria", "Excess urination.")],
    },
    "C0020538": {
        "genes": ["AGT"],
        "snomed": [("S0001008", "hypertensive disorder", "SC38341003", "SNOMEDCT_US")],
        "clinical_features": [],
    },
    "C0004096": {
        "genes": ["IL13"],
        "snomed": [("S0001009", "asthma", "SC195967001", "SNOMEDCT_US")],
        "clinical_features": [("C0043144", "Finding", "Wheezing", "")],
    },
    "C0027051": {
        "genes": ["MYH7"],
        "snomed": [("S0001010", "myocardial infarction", "SC22298006", "SNOMEDCT_US")],
        "clinical_features": [("C0008031", "Finding", "Chest pain", "Pain in the chest.")],
    },
    "C0036341": {
        "genes": ["DISC1"],
        "snomed": [("S0001011", "schizophrenia", "SC58214004", "SNOMEDCT_US")],
        "clinical_features": [("C0018524", "Finding", "Hallucinations", "")],
    },
}

# Subset of MEDGEN keys with non-empty genes (mim2gene set analogue,
# utils.py:4-39 / medgen.py:214-219).
MEDGEN_GENE_CUIS = sorted(k for k, v in MEDGEN.items() if v["genes"])

# UniProt analogue rows. 'LR3' has no primary-gene row -> matched only via
# the GeneNames substring fallback (row P16473 carries 'TSHR LR3').
# P07202's molecular-function cell contains a malformed segment (no '[').
UNIPROT: list[dict] = [
    {
        "Entry": "P00439", "EntryName": "PH4H_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Phenylalanine-4-hydroxylase (PAH) (Phe-4-monooxygenase)",
        "GeneNames": "PAH PH", "GenePrimary": "PAH",
        "Function": "Catalyzes the hydroxylation of L-phenylalanine to L-tyrosine.",
        "go_molecular_function": "phenylalanine 4-monooxygenase activity [GO:0004505]; iron ion binding [GO:0005506]",
        "go_biological_process": "L-phenylalanine catabolic process [GO:0006559]",
        "go_cellular_component": "cytoplasm [GO:0005737]",
    },
    {
        "Entry": "P09417", "EntryName": "DHPR_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Dihydropteridine reductase (HDHPR) (Quinoid dihydropteridine reductase)",
        "GeneNames": "QDPR DHPR SDR33C1", "GenePrimary": "QDPR",
        "Function": "Regenerates tetrahydrobiopterin.",
        "go_molecular_function": "6,7-dihydropteridine reductase activity [GO:0004155]",
        "go_biological_process": "tetrahydrobiopterin biosynthetic process [GO:0006729]",
        "go_cellular_component": "cytosol [GO:0005829]",
    },
    {
        "Entry": "P16473", "EntryName": "TSHR_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Thyrotropin receptor (TSH-R)",
        "GeneNames": "TSHR LR3", "GenePrimary": "TSHR",
        "Function": "Receptor for thyrothropin.",
        "go_molecular_function": "thyroid-stimulating hormone receptor activity [GO:0004996]",
        "go_biological_process": "hormone-mediated signaling pathway [GO:0009755]",
        "go_cellular_component": "plasma membrane [GO:0005886]",
    },
    {
        "Entry": "P07202", "EntryName": "PERT_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Thyroid peroxidase (TPO)",
        "GeneNames": "TPO TPX", "GenePrimary": "TPO",
        "Function": "Iodination of tyrosine residues in thyroglobulin.",
        # first segment malformed (no '[') -> must be skipped (uniprotpipe.py:135)
        "go_molecular_function": "broken go segment GO:0000001]; heme binding [GO:0020037]",
        "go_biological_process": "thyroid hormone generation [GO:0006590]",
        "go_cellular_component": "",
    },
    {
        "Entry": "P35498", "EntryName": "SCN1A_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Sodium channel protein type 1 subunit alpha (NaV1.1)",
        "GeneNames": "SCN1A NAC1 SCN1", "GenePrimary": "SCN1A",
        "Function": "Mediates voltage-dependent sodium ion permeability.",
        "go_molecular_function": "voltage-gated sodium channel activity [GO:0005248]",
        "go_biological_process": "neuronal action potential [GO:0019228]",
        "go_cellular_component": "axon initial segment [GO:0043194]",
    },
    {
        "Entry": "O75140", "EntryName": "DEP5_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "GATOR complex protein DEPDC5",
        "GeneNames": "DEPDC5 KIAA0645", "GenePrimary": "DEPDC5",
        "Function": "Component of the GATOR1 complex inhibiting mTORC1.",
        "go_molecular_function": "",
        "go_biological_process": "negative regulation of TORC1 signaling [GO:1904262]",
        "go_cellular_component": "GATOR complex [GO:1990130]",
    },
    {
        "Entry": "P01308", "EntryName": "INS_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Insulin",
        "GeneNames": "INS", "GenePrimary": "INS",
        "Function": "Decreases blood glucose concentration.",
        "go_molecular_function": "hormone activity [GO:0005179]",
        "go_biological_process": "glucose metabolic process [GO:0006006]",
        "go_cellular_component": "extracellular space [GO:0005615]",
    },
    {
        "Entry": "P06213", "EntryName": "INSR_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Insulin receptor (IR)",
        "GeneNames": "INSR", "GenePrimary": "INSR",
        "Function": "Receptor tyrosine kinase mediating insulin action.",
        "go_molecular_function": "insulin receptor activity [GO:0005009]",
        "go_biological_process": "insulin receptor signaling pathway [GO:0008286]",
        "go_cellular_component": "plasma membrane [GO:0005886]",
    },
    {
        "Entry": "P01019", "EntryName": "ANGT_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Angiotensinogen (Serpin A8)",
        "GeneNames": "AGT SERPINA8", "GenePrimary": "AGT",
        "Function": "Essential component of the renin-angiotensin system.",
        "go_molecular_function": "hormone activity [GO:0005179]",
        "go_biological_process": "regulation of blood pressure [GO:0008217]",
        "go_cellular_component": "blood microparticle [GO:0072562]",
    },
    {
        "Entry": "P35225", "EntryName": "IL13_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Interleukin-13 (IL-13)",
        "GeneNames": "IL13 NC30", "GenePrimary": "IL13",
        "Function": "Cytokine regulating inflammatory responses.",
        "go_molecular_function": "cytokine activity [GO:0005125]",
        "go_biological_process": "immune response [GO:0006955]",
        "go_cellular_component": "extracellular space [GO:0005615]",
    },
    {
        "Entry": "P12883", "EntryName": "MYH7_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Myosin-7 (Myosin heavy chain 7)",
        "GeneNames": "MYH7 MYHCB", "GenePrimary": "MYH7",
        "Function": "Muscle contraction motor protein.",
        "go_molecular_function": "motor activity [GO:0003774]",
        "go_biological_process": "muscle contraction [GO:0006936]",
        "go_cellular_component": "myosin complex [GO:0016459]",
    },
    {
        "Entry": "Q9NRI5", "EntryName": "DISC1_HUMAN", "Reviewed": "reviewed",
        "Organism": "Homo sapiens (Human)",
        "ProteinNames": "Disrupted in schizophrenia 1 protein",
        "GeneNames": "DISC1 KIAA0457", "GenePrimary": "DISC1",
        "Function": "Involved in neurite outgrowth and cortical development.",
        "go_molecular_function": "protein binding [GO:0005515]",
        "go_biological_process": "brain development [GO:0007420]",
        "go_cellular_component": "centrosome [GO:0005813]",
    },
]

GO_TYPES = ["molecular function", "biological process", "cellular component"]

TOPICS = ["phenylketonuria", "hyperthyroidism", "epilepsy"]
