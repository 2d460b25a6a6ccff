"""Deterministic fixture terminology (FIXTURES.md §2).

~40 UMLS-style concepts chosen so every matcher branch is exercised:
subsumption (melanoma / cancer / breast cancer; deep margin vs deep vs
margin — NobleCoderTerminology.java:113), word-gap contiguity (red dog),
acronym scoring (DCIS / FISH — scorer :2561-2591, :2623-2629), regex
synonyms (/nevus [a-z]+/ — addConcept:1161-1183), normalization (nevi,
Alzheimer's disease, Protégé term), stop-word terms (cancer of the skin),
hot-word skew (skin in 15+ synonyms), a depth-5 ISA chain with a diamond,
and a shared synonym (cold) for best-candidate selection.
"""

from __future__ import annotations

from ..config import SearchConfig
from ..terminology.storage import Dictionary, build_dictionary

# (cui, name, synonyms, sem_types, sources, terms[(text, form)])
FIXTURE_CONCEPTS: list[dict] = [
    # --- core neoplasm hierarchy (ISA chain depth 5 + diamond) ---
    dict(cui="C0012634", name="Disease", synonyms=["Disease", "disorder"],
         sem_types=["Disease or Syndrome"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0027651", name="Neoplasm",
         synonyms=["Neoplasm", "tumor", "tumour", "neoplasms"],
         sem_types=["Neoplastic Process"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0006826", name="Cancer",
         synonyms=["Cancer", "malignancy", "malignant neoplasm", "cancers"],
         sem_types=["Neoplastic Process"], sources=["NCI", "SNOMEDCT", "MTH"]),
    dict(cui="C0007114", name="Skin cancer",
         synonyms=["Skin cancer", "cancer of the skin", "malignant skin neoplasm",
                   "malignant neoplasm of skin", "skin cancers"],
         sem_types=["Neoplastic Process"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0025202", name="Melanoma",
         synonyms=["Melanoma", "malignant melanoma", "melanomas"],
         sem_types=["Neoplastic Process"], sources=["NCI", "SNOMEDCT", "MTH"]),
    dict(cui="C0151779", name="Cutaneous melanoma",
         synonyms=["Cutaneous melanoma", "melanoma of skin", "skin melanoma",
                   "malignant melanoma of skin"],
         sem_types=["Neoplastic Process"], sources=["NCI"]),
    dict(cui="C0346109", name="Breast cancer",
         synonyms=["Breast cancer", "carcinoma of breast", "breast carcinoma",
                   "malignant neoplasm of breast"],
         sem_types=["Neoplastic Process"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0011389", name="Ductal carcinoma in situ",
         synonyms=["Ductal carcinoma in situ", "DCIS",
                   "intraductal carcinoma", "ductal carcinoma in situ of breast"],
         sem_types=["Neoplastic Process"], sources=["NCI", "SNOMEDCT"],
         terms=[("DCIS", "AB"), ("Ductal carcinoma in situ", "PT")]),
    # --- anatomy (skin is the designated hot/skew word) ---
    dict(cui="C1123023", name="Skin",
         synonyms=["Skin", "skin structure", "cutaneous", "integument"],
         sem_types=["Body System"], sources=["NCI", "SNOMEDCT", "FMA"]),
    dict(cui="C0221912", name="Skin lesion",
         synonyms=["Skin lesion", "lesion of skin", "cutaneous lesion"],
         sem_types=["Finding"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0037284", name="Skin rash",
         synonyms=["Skin rash", "rash of skin", "exanthem"],
         sem_types=["Sign or Symptom"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0151811", name="Dry skin",
         synonyms=["Dry skin", "skin dryness", "xerosis of skin"],
         sem_types=["Finding"], sources=["SNOMEDCT"]),
    dict(cui="C0came01", name="Skin biopsy",
         synonyms=["Skin biopsy", "biopsy of skin", "skin punch biopsy"],
         sem_types=["Diagnostic Procedure"], sources=["NCI"]),
    dict(cui="C0came02", name="Skin graft",
         synonyms=["Skin graft", "graft of skin", "skin grafting"],
         sem_types=["Therapeutic Procedure"], sources=["NCI"]),
    dict(cui="C0came03", name="Skin ulcer",
         synonyms=["Skin ulcer", "ulcer of skin", "ulceration of skin"],
         sem_types=["Disease or Syndrome"], sources=["SNOMEDCT"]),
    dict(cui="C0came04", name="Skin tag",
         synonyms=["Skin tag", "acrochordon", "fibroepithelial polyp of skin"],
         sem_types=["Neoplastic Process"], sources=["SNOMEDCT"]),
    # --- margins (subsumption doc example: deep margin vs deep vs margin) ---
    dict(cui="C0205125", name="Deep",
         synonyms=["Deep"], sem_types=["Spatial Concept"], sources=["NCI"]),
    dict(cui="C0205284", name="Margin",
         synonyms=["Margin", "margins"], sem_types=["Spatial Concept"],
         sources=["NCI"]),
    dict(cui="C1durm01", name="Deep margin",
         synonyms=["Deep margin", "deep margins"],
         sem_types=["Spatial Concept"], sources=["NCI"]),
    # --- contiguity example (red dog; gap-1 matches 'red swift dog') ---
    dict(cui="C1reddog", name="Red dog",
         synonyms=["Red dog"], sem_types=["Finding"], sources=["TEST"]),
    dict(cui="C1red000", name="Red color",
         synonyms=["Red"], sem_types=["Qualitative Concept"], sources=["TEST"]),
    # --- acronym / case disambiguation (FISH test vs fish animal) ---
    dict(cui="C0016163", name="FISH",
         synonyms=["FISH", "fluorescence in situ hybridization"],
         sem_types=["Molecular Biology Research Technique"], sources=["NCI"],
         terms=[("FISH", "ACR"), ("fluorescence in situ hybridization", "PT")]),
    dict(cui="C0016153", name="Fish",
         synonyms=["fish", "fishes", "Fish"],
         sem_types=["Fish"], sources=["NCBI"]),
    # --- normalization exercises ---
    dict(cui="C0027960", name="Nevus",
         synonyms=["Nevus", "nevi", "naevus", "mole of skin"],
         sem_types=["Neoplastic Process"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0302314", name="Dysplastic nevus",
         synonyms=["Dysplastic nevus", "atypical nevus", "atypical mole",
                   "/nevus [a-z]+tic/"],
         sem_types=["Neoplastic Process"], sources=["NCI"]),
    dict(cui="C0002395", name="Alzheimer's disease",
         synonyms=["Alzheimer's disease", "Alzheimer disease", "Alzheimers disease"],
         sem_types=["Disease or Syndrome"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C1prote1", name="Protégé term",
         synonyms=["Protégé term"], sem_types=["Intellectual Product"],
         sources=["TEST"]),
    # --- shared single-word synonym (cold): two CUIs ---
    dict(cui="C0009443", name="Common cold",
         synonyms=["Common cold", "cold", "acute coryza"],
         sem_types=["Disease or Syndrome"], sources=["NCI", "SNOMEDCT", "MTH"]),
    dict(cui="C0009264", name="Cold temperature",
         synonyms=["Cold temperature", "cold", "low temperature"],
         sem_types=["Natural Phenomenon or Process"], sources=["NCI"]),
    # --- misc clinical vocabulary for synthetic corpus ---
    dict(cui="C0005558", name="Biopsy",
         synonyms=["Biopsy", "biopsies", "bx"],
         sem_types=["Diagnostic Procedure"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0015230", name="Rash",
         synonyms=["Rash", "rashes", "skin eruption"],
         sem_types=["Sign or Symptom"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0030193", name="Pain",
         synonyms=["Pain", "ache", "aches", "painful"],
         sem_types=["Sign or Symptom"], sources=["NCI", "SNOMEDCT", "MTH"]),
    dict(cui="C0015967", name="Fever",
         synonyms=["Fever", "pyrexia", "febrile", "fevers"],
         sem_types=["Sign or Symptom"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0011847", name="Diabetes",
         synonyms=["Diabetes", "diabetes mellitus"],
         sem_types=["Disease or Syndrome"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0020538", name="Hypertension",
         synonyms=["Hypertension", "high blood pressure", "HTN"],
         sem_types=["Disease or Syndrome"], sources=["NCI", "SNOMEDCT"],
         terms=[("HTN", "AB"), ("Hypertension", "PT")]),
    dict(cui="C0004096", name="Asthma",
         synonyms=["Asthma", "bronchial asthma"],
         sem_types=["Disease or Syndrome"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0018681", name="Headache",
         synonyms=["Headache", "cephalgia", "headaches", "head ache"],
         sem_types=["Sign or Symptom"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0027497", name="Nausea",
         synonyms=["Nausea", "nauseous", "queasy"],
         sem_types=["Sign or Symptom"], sources=["NCI"]),
    dict(cui="C0011991", name="Diarrhea",
         synonyms=["Diarrhea", "diarrhoea", "loose stools"],
         sem_types=["Sign or Symptom"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0013404", name="Dyspnea",
         synonyms=["Dyspnea", "shortness of breath", "SOB", "breathlessness"],
         sem_types=["Sign or Symptom"], sources=["NCI", "SNOMEDCT"],
         terms=[("SOB", "AB"), ("Dyspnea", "PT")]),
    dict(cui="C0008031", name="Chest pain",
         synonyms=["Chest pain", "pain in chest", "thoracic pain"],
         sem_types=["Sign or Symptom"], sources=["NCI", "SNOMEDCT"]),
    dict(cui="C0151786", name="Muscle weakness",
         synonyms=["Muscle weakness", "weakness of muscle", "myasthenia"],
         sem_types=["Sign or Symptom"], sources=["SNOMEDCT"]),
]

# child -> parent BROADER edges; melanoma chain depth 5 + diamond via
# cutaneous melanoma (two parents: melanoma and skin cancer).
FIXTURE_ISA_EDGES: list[tuple[str, str]] = [
    ("C0027651", "C0012634"),  # neoplasm -> disease
    ("C0006826", "C0027651"),  # cancer -> neoplasm
    ("C0007114", "C0006826"),  # skin cancer -> cancer
    ("C0025202", "C0007114"),  # melanoma -> skin cancer
    ("C0151779", "C0025202"),  # cutaneous melanoma -> melanoma (diamond left)
    ("C0151779", "C0007114"),  # cutaneous melanoma -> skin cancer (diamond right)
    ("C0346109", "C0006826"),  # breast cancer -> cancer
    ("C0011389", "C0346109"),  # DCIS -> breast cancer
    ("C0027960", "C0027651"),  # nevus -> neoplasm
    ("C0302314", "C0027960"),  # dysplastic nevus -> nevus
    ("C0221912", "C0012634"),  # skin lesion -> disease
    ("C0came03", "C0221912"),  # skin ulcer -> skin lesion
    ("C0came04", "C0027651"),  # skin tag -> neoplasm
    ("C0009443", "C0012634"),  # common cold -> disease
    ("C0011847", "C0012634"),  # diabetes -> disease
    ("C0020538", "C0012634"),  # hypertension -> disease
    ("C0004096", "C0012634"),  # asthma -> disease
]


def fixture_dictionary(cfg: SearchConfig | None = None) -> Dictionary:
    return build_dictionary(FIXTURE_CONCEPTS, cfg, isa_edges=FIXTURE_ISA_EDGES)
