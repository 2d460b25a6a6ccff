"""END-TO-END matcher differential: our matcher vs the COMPILED REFERENCE
ENGINE (`NobleCoderTerminology.process(Sentence)`).

The reference's three Maven dependencies are bundled in its `lib/`, so the
whole engine compiles as-is (one stray unused IDE import stripped). The
harness (`.scratch/fullref/DiffMain.java`) builds an in-memory terminology
from our fixture concepts over stdin, sets the best-match flags, processes
each corpus sentence, and prints every mention (cui, matched term, score,
word annotations with offsets). This script diffs that against
`matcher.core.process_sentence` on identical inputs — the direct
measurement of the "P/R vs reference annotations" acceptance metric.

Usage: python scripts/matcher_parity.py   (skips if javac/reference absent)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(ROOT, ".scratch", "fullref")
REF_SRC = "/root/reference/src/main/java"
LIBS = ":".join(
    f"/root/reference/lib/{j}" for j in
    ("jdbm-3.0.jar", "owlapi-distribution-3.5.0.jar", "servlet-2_3.jar"))
CP = f".:classes:/root/reference/src/main/resources:{LIBS}"
US = "\x1f"

DIFF_MAIN = r'''import edu.pitt.dbmi.nlp.noble.coder.model.Mention;
import edu.pitt.dbmi.nlp.noble.coder.model.Sentence;
import edu.pitt.dbmi.nlp.noble.terminology.Annotation;
import edu.pitt.dbmi.nlp.noble.terminology.Concept;
import edu.pitt.dbmi.nlp.noble.terminology.SemanticType;
import edu.pitt.dbmi.nlp.noble.terminology.Source;
import edu.pitt.dbmi.nlp.noble.terminology.Term;
import edu.pitt.dbmi.nlp.noble.terminology.impl.NobleCoderTerminology;
import edu.pitt.dbmi.nlp.noble.tools.AcronymDetector;
import edu.pitt.dbmi.nlp.noble.tools.NegEx;
import edu.pitt.dbmi.nlp.noble.coder.model.Modifier;
import edu.pitt.dbmi.nlp.noble.terminology.Relation;
import edu.pitt.dbmi.nlp.noble.tools.ConText;
import edu.pitt.dbmi.nlp.noble.tools.TermFilter;
import edu.pitt.dbmi.nlp.noble.util.PathHelper;
import edu.pitt.dbmi.nlp.noble.coder.model.Document;
import edu.pitt.dbmi.nlp.noble.coder.model.Section;
import edu.pitt.dbmi.nlp.noble.coder.model.Paragraph;
import edu.pitt.dbmi.nlp.noble.coder.processor.DocumentProcessor;
import edu.pitt.dbmi.nlp.noble.coder.processor.ParagraphProcessor;

import java.io.*;
import java.util.*;

// End-to-end matcher differential harness.
// stdin protocol (US = ):
//   C <US> cui <US> name <US> syn|syn|... <US> st;st <US> src;src <US> text:form,text:form
//   Q <US> sentence text            (after all C lines)
// stdout: for each Q, one line per mention:
//   M <US> qIndex <US> cui <US> matchedTerm <US> score <US> text@off,text@off
// then: D <US> qIndex  (sentence done)
public class DiffMain {
    public static void main(String[] args) throws Exception {
        String us = "";
        NobleCoderTerminology term = new NobleCoderTerminology();
        // best-match flags (setupSearch semantics)
        term.setSubsumptionMode(true);
        term.setOverlapMode(true);
        term.setContiguousMode(true);
        term.setOrderedMode(false);
        term.setPartialMode(false);
        term.setMaximumWordGap(1);
        term.setScoreConcepts(true);
        term.setSelectBestCandidate(false);
        term.setIgnoreUsedWords(true);
        term.setStemWords(true);
        term.setStripStopWords(true);
        term.setIgnoreSmallWords(true);
        term.setIgnoreDigits(false);

        BufferedReader r = new BufferedReader(new InputStreamReader(System.in, "UTF-8"));
        PrintWriter w = new PrintWriter(new OutputStreamWriter(System.out, "UTF-8"));
        String line;
        int qi = 0;
        AcronymDetector acro = new AcronymDetector();
        // strict modifier terminology for the ConText differential
        NobleCoderTerminology mod = new NobleCoderTerminology();
        mod.setDefaultSearchMethod(NobleCoderTerminology.CUSTOM_MATCH);
        mod.setContiguousMode(true);
        mod.setSubsumptionMode(false);
        mod.setOverlapMode(true);
        mod.setPartialMode(false);
        mod.setOrderedMode(true);
        mod.setMaximumWordGap(0);
        mod.setScoreConcepts(false);
        mod.setHandlePossibleAcronyms(false);
        mod.setStemWords(false);
        mod.setStripStopWords(false);
        mod.setIgnoreSmallWords(false);
        mod.setIgnoreDigits(false);
        mod.setSemanticTypeFilter(ConText.SEMTYPE_INSTANCE);
        ConText context = null;
        while ((line = r.readLine()) != null) {
            String[] f = line.split(us, -1);
            if (f[0].equals("DOC")) {        // new document: clear acronyms
                acro.clearAcronyms();
                continue;
            }
            if (f[0].equals("C")) {
                Concept c = new Concept(f[1], f[2]);
                if (!f[3].isEmpty())
                    c.setSynonyms(f[3].split("\\|"));
                if (!f[4].isEmpty())
                    for (String st : f[4].split(";"))
                        c.addSemanticType(SemanticType.getSemanticType(st));
                if (!f[5].isEmpty())
                    for (String src : f[5].split(";"))
                        c.addSource(Source.getSource(src));
                if (!f[6].isEmpty()) {
                    for (String tf : f[6].split(",")) {
                        int i = tf.lastIndexOf(':');
                        Term t = Term.getTerm(tf.substring(0, i));
                        t.setForm(tf.substring(i + 1));
                        c.addTerm(t);
                    }
                }
                term.addConcept(c);
            } else if (f[0].equals("X")) {
                // modifier lexicon concept:
                // X cui name syn|syn st;st prop=val;... rel=c1|c2;rel=...
                Concept c = new Concept(f[1], f[2]);
                if (!f[3].isEmpty()) c.setSynonyms(f[3].split("\\|"));
                if (!f[4].isEmpty())
                    for (String st : f[4].split(";"))
                        c.addSemanticType(SemanticType.getSemanticType(st));
                if (!f[5].isEmpty())
                    for (String pv : f[5].split(";")) {
                        int i = pv.indexOf('=');
                        c.addProperty(pv.substring(0, i), pv.substring(i + 1));
                    }
                if (!f[6].isEmpty())
                    for (String rv : f[6].split(";")) {
                        int i = rv.indexOf('=');
                        Relation rel = Relation.getRelation(rv.substring(0, i));
                        for (String tgt : rv.substring(i + 1).split("\\|"))
                            c.addRelatedConcept(rel, tgt);
                    }
                mod.addConcept(c);
            } else if (f[0].equals("DP")) {
                // document processor: sections + typed sentences
                Document d = new DocumentProcessor().process(f[1]
                    .replace("\\n", "\n").replace("\\t", "\t"));
                StringBuilder b = new StringBuilder("P");
                for (Section sec : d.getSections())
                    b.append(us).append("S|").append(sec.getTitleOffset())
                     .append("|").append(sec.getTitle().replace("\n", "\\n"));
                for (Sentence sn : d.getSentences())
                    b.append(us).append(sn.getSentenceType()).append("|")
                     .append(sn.getOffset()).append("|")
                     .append(sn.getText().replace("\n", "\\n"));
                w.println(b.toString());
            } else if (f[0].equals("PP")) {
                // paragraph differential: DocumentProcessor sections, then
                // ParagraphProcessor spans + part labels
                Document d = new DocumentProcessor().process(f[1]
                    .replace("\\n", "\n").replace("\\t", "\t"));
                new ParagraphProcessor().process(d);
                StringBuilder b = new StringBuilder("G");
                for (Paragraph p : d.getParagraphs())
                    b.append(us).append(p.getStartPosition()).append("|")
                     .append(p.getEndPosition()).append("|")
                     .append(p.getPart() == null ? ""
                             : p.getPart().replace("\n", "\\n"));
                w.println(b.toString());
            } else if (f[0].equals("R")) {
                // attach a BROADER edge to an existing anchor concept
                Concept c = term.lookupConcept(f[1]);
                c.addRelatedConcept(Relation.BROADER, f[2]);
                term.getStorage().getConceptMap().put(f[1], c.getContent());
            } else if (f[0].equals("PH")) {
                PathHelper ph = new PathHelper(term);
                StringBuilder b = new StringBuilder("A");
                Map<Concept, Integer> anc =
                    ph.findAncestors(term.lookupConcept(f[1]));
                for (Concept ac : anc.keySet())
                    b.append(us).append(ac.getCode()).append(":")
                     .append(anc.get(ac));
                w.println(b.toString());
            } else if (f[0].equals("TF")) {
                StringBuilder b = new StringBuilder("F");
                for (String t : TermFilter.filter(f[1]))
                    b.append(us).append(t);
                w.println(b.toString());
            } else if (f[0].equals("CTX")) {
                context = new ConText(mod);
            } else if (f[0].equals("O")) {
                // process() re-applies setupSearch(defaultSearchMethod),
                // so the mode MUST go through setDefaultSearchMethod;
                // reset the flags the presets leave untouched so each
                // mode behaves like a fresh engine
                term.setIgnoreUsedWords(true);
                term.setMaximumWordGap(1);
                term.setDefaultSearchMethod(f[1]);
            } else if (f[0].equals("Q") || f[0].equals("QA")
                       || f[0].equals("QN") || f[0].equals("QC")) {
                Sentence s = new Sentence(f[1], 0, Sentence.TYPE_PROSE);
                term.process(s);
                if (f[0].equals("QA")) acro.process(s);
                if (f[0].equals("QN")) new NegEx().process(s);
                if (f[0].equals("QC")) context.process(s);
                for (Mention m : s.getMentions()) {
                    StringBuilder a = new StringBuilder();
                    for (Annotation an : m.getAnnotations()) {
                        if (a.length() > 0) a.append(",");
                        a.append(an.getText()).append("@").append(an.getOffset());
                    }
                    StringBuilder mods = new StringBuilder();
                    for (String ty : new TreeSet<String>(m.getModifierMap().keySet())) {
                        for (Modifier mo : m.getModifierMap().get(ty)) {
                            if (mods.length() > 0) mods.append(",");
                            mods.append(ty).append("=").append(mo.getValue());
                        }
                    }
                    w.println("M" + us + qi + us + m.getConcept().getCode()
                              + us + m.getConcept().getMatchedTerm()
                              + us + m.getConcept().getScore()
                              + us + a + us + mods);
                }
                w.println("D" + us + qi);
                qi++;
            }
        }
        w.flush();
    }
}
'''


def build() -> bool:
    if not shutil.which("javac") or not os.path.isdir(REF_SRC):
        return False
    if os.path.exists(os.path.join(SCRATCH, "DiffMain.class")):
        return True
    os.makedirs(os.path.join(SCRATCH, "classes"), exist_ok=True)
    src = os.path.join(SCRATCH, "src")
    if not os.path.isdir(src):
        shutil.copytree(REF_SRC, src)
        p = os.path.join(
            src, "edu/pitt/dbmi/nlp/noble/coder/model/Mention.java")
        with open(p) as f:
            code = f.read()
        code = code.replace(
            "import com.sun.org.apache.xpath.internal.operations.Mod;", "")
        with open(p, "w") as f:
            f.write(code)
    sources = []
    for dirpath, _, files in os.walk(src):
        sources += [os.path.join(dirpath, f) for f in files
                    if f.endswith(".java")]
    with open(os.path.join(SCRATCH, "sources.txt"), "w") as f:
        f.write("\n".join(sources))
    with open(os.path.join(SCRATCH, "DiffMain.java"), "w") as f:
        f.write(DIFF_MAIN)
    r = subprocess.run(
        ["javac", "-encoding", "UTF-8", "-nowarn", "-cp", LIBS,
         "-d", "classes", "@sources.txt"], cwd=SCRATCH, capture_output=True)
    if r.returncode != 0:
        print(r.stderr.decode()[:600])
        return False
    r = subprocess.run(
        ["javac", "-encoding", "UTF-8", "-nowarn", "-cp",
         f"classes:{LIBS}", "DiffMain.java"],
        cwd=SCRATCH, capture_output=True)
    return r.returncode == 0


def run_reference(concepts, sentences, mode="best-match") -> dict[int, set]:
    lines = []
    for c in concepts:
        terms = ",".join(f"{t[0]}:{t[1]}" for t in c.get("terms", ()))
        lines.append(US.join([
            "C", c["cui"], c["name"], "|".join(c.get("synonyms", ())),
            ";".join(c.get("sem_types", ())),
            ";".join(c.get("sources", ())), terms]))
    lines.append(US.join(["O", mode]))
    for s in sentences:
        lines.append(US.join(["Q", s]))
    proc = subprocess.run(
        ["java", "-cp", CP, "DiffMain"], cwd=SCRATCH,
        input="\n".join(lines), capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-800:])
    out: dict[int, set] = {i: set() for i in range(len(sentences))}
    for line in proc.stdout.splitlines():
        f = line.split(US)
        if f[0] == "M":
            qi = int(f[1])
            anns = tuple(sorted(
                (a.rsplit("@", 1)[0], int(a.rsplit("@", 1)[1]))
                for a in f[5].split(",") if a))
            out[qi].add((f[2], f[3], round(float(f[4]), 4), anns))
    return out


def run_ours(concepts, sentences, isa_edges, mode="best-match") -> dict[int, set]:
    sys.path.insert(0, ROOT)
    from nobletools_spark.config import for_search_method
    from nobletools_spark.matcher.core import process_sentence
    from nobletools_spark.terminology.storage import build_dictionary
    dico = build_dictionary(concepts, isa_edges=isa_edges)
    cfg = for_search_method(mode)
    out: dict[int, set] = {}
    for i, s in enumerate(sentences):
        ms = set()
        for m in process_sentence(s, dico, cfg):
            anns = tuple(sorted((t, o) for t, o in m.annotations))
            ms.add((m.cui, m.matched_term, round(m.score, 4), anns))
        out[i] = ms
    return out


def main() -> int:
    if not build():
        print("SKIP: javac or reference sources unavailable")
        return 0
    sys.path.insert(0, ROOT)
    from nobletools_spark.pipeline.documents import generate_documents_local
    from nobletools_spark.sentence.splitter import (filter_sentence,
                                                    process_document)
    from nobletools_spark.terminology.fixture import (FIXTURE_CONCEPTS,
                                                      FIXTURE_ISA_EDGES)

    sentences: list[str] = []
    for _, spans in generate_documents_local(150, seed=123):
        for sp in spans:
            if sp["kind"] != "text" or not sp["text"]:
                continue
            rows, _ = process_document(sp["text"])
            for r in rows:
                if not filter_sentence(r.text, r.sent_type):
                    t = r.text.strip()
                    if t and "\n" not in t and US not in t:
                        sentences.append(t)
    extra = [
        "No evidence of malignant melanoma or DCIS.",
        "The deep margin is clear; deep margins are involved.",
        "red swift dog and red dog and just red",
        "cancer of the skin vs skin cancers",
        "Alzheimer's disease and Alzheimers disease",
        "nevus flammeus with dysplastic nevus",  # regex synonym
        "FISH was positive. fish were swimming.",
        "cold COLD Cold",
        "biopsy of skin, skin punch biopsy, bx",
        "2.5 mm melanoma at 3.7 cm",
    ]
    sentences += extra
    print(f"{len(FIXTURE_CONCEPTS)} concepts, {len(sentences)} sentences")

    all_ok = True
    for mode in ("best-match", "all-match", "precise-match",
                 "nonoverlap-match", "partial-match"):
        ref = run_reference(FIXTURE_CONCEPTS, sentences, mode)
        ours = run_ours(FIXTURE_CONCEPTS, sentences, FIXTURE_ISA_EDGES, mode)
        mismatched = 0
        tp = fp = fn = 0
        for i, s in enumerate(sentences):
            a, b = ref[i], ours[i]
            ka = {(c, anns) for c, _, _, anns in a}
            kb = {(c, anns) for c, _, _, anns in b}
            tp += len(ka & kb)
            fp += len(kb - ka)
            fn += len(ka - kb)
            if a != b:
                mismatched += 1
                if mismatched <= 5:
                    print(f"DIFF [{mode}] {s!r}")
                    for x in sorted(a - b):
                        print("   ref-only:", x)
                    for x in sorted(b - a):
                        print("   ours-only:", x)
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        ok = p >= 0.95 and r >= 0.95 and mismatched == 0
        all_ok = all_ok and ok
        print(f"{mode}: diffs {mismatched}/{len(sentences)} "
              f"P={p:.4f} R={r:.4f} (TP={tp} FP={fp} FN={fn})"
              + ("" if ok else "  <-- FAIL"))
    ok2 = run_acronym_diff()
    ok3 = run_negex_diff()
    ok4 = run_context_diff()
    ok5 = run_termfilter_diff()
    ok6 = run_ancestors_diff()
    ok7 = run_docproc_diff()
    ok8 = run_paragraph_diff()
    all_ok = all_ok and ok2 and ok3 and ok4 and ok5 and ok6 and ok7 and ok8
    print("overall:", "PASS" if all_ok else "FAIL")
    return 0 if all_ok else 1


def _reference_docs(doc_sets, qcmd) -> dict[int, set]:
    from nobletools_spark.terminology.fixture import FIXTURE_CONCEPTS
    lines = []
    for c in FIXTURE_CONCEPTS:
        terms = ",".join(f"{t[0]}:{t[1]}" for t in c.get("terms", ()))
        lines.append(US.join([
            "C", c["cui"], c["name"], "|".join(c.get("synonyms", ())),
            ";".join(c.get("sem_types", ())),
            ";".join(c.get("sources", ())), terms]))
    lines.append(US.join(["O", "best-match"]))
    for doc in doc_sets:
        lines.append("DOC")
        for s in doc:
            lines.append(US.join([qcmd, s]))
    proc = subprocess.run(
        ["java", "-cp", CP, "DiffMain"], cwd=SCRATCH,
        input="\n".join(lines), capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-800:])
    out: dict[int, set] = {}
    for line in proc.stdout.splitlines():
        f = line.split(US)
        if f[0] == "M":
            qi = int(f[1])
            anns = tuple(sorted(
                (a.rsplit("@", 1)[0], int(a.rsplit("@", 1)[1]))
                for a in f[5].split(",") if a))
            mods = tuple(sorted(f[6].split(","))) if len(f) > 6 and f[6] else ()
            out.setdefault(qi, set()).add((f[2], anns, mods))
        elif f[0] == "D":
            out.setdefault(int(f[1]), set())
    return out


ACRO_DOCS = [
    ["Patient diagnosed with ductal carcinoma in situ (DCIS) today.",
     "The DCIS was excised.",
     "No recurrence of DCIS."],
    ["Patient has high blood pressure (HBP) per chart.",
     "HBP well controlled today."],
    ["We performed fluorescence in situ hybridization (FISH) assay.",
     "FISH results were positive."],
    ["The DCIS was noted.",          # no definition in this doc
     "Deep margin (DM) is clear.",
     "DM involved by tumor."],
]


def run_acronym_diff() -> bool:
    sys.path.insert(0, ROOT)
    from nobletools_spark.config import for_search_method
    from nobletools_spark.context.acronyms import AcronymState
    from nobletools_spark.matcher.core import process_sentence
    from nobletools_spark.terminology.fixture import (FIXTURE_CONCEPTS,
                                                      fixture_dictionary)
    ref = _reference_docs(ACRO_DOCS, "QA")
    dico = fixture_dictionary()
    cfg = for_search_method("best-match")
    qi = 0
    bad = 0
    for doc in ACRO_DOCS:
        state = AcronymState(dico)
        for s in doc:
            ms = state.process(s, process_sentence(s, dico, cfg))
            ours = {(m.cui, tuple(sorted((t, o) for t, o in m.annotations)), ())
                    for m in ms}
            got = {(c, a, ()) for c, a, _ in ref.get(qi, set())}
            if ours != got:
                bad += 1
                print(f"ACRO DIFF {s!r}")
                for x in sorted(got - ours):
                    print("   ref-only :", x)
                for x in sorted(ours - got):
                    print("   ours-only:", x)
            qi += 1
    print(f"acronym doc-pass: {qi} sentences, {bad} diffs"
          + ("" if bad == 0 else "  <-- FAIL"))
    return bad == 0


NEGEX_SENTS = [
    "Patient denies fever or chills.",
    "Rash is absent.",
    "No fever but rash was seen.",
    "Melanoma cannot be assessed.",
    "No increase in rash.",
    "There is no evidence of melanoma.",
    "Fever was ruled out yesterday.",
    "Not likely melanoma, however rash is present.",
    "The patient was not seen for fever.",
    "Free of cancer; asthma not identified.",
]


def run_negex_diff() -> bool:
    sys.path.insert(0, ROOT)
    from nobletools_spark.config import for_search_method
    from nobletools_spark.context import negex as NX
    from nobletools_spark.matcher.core import process_sentence
    from nobletools_spark.terminology.fixture import fixture_dictionary
    ref = _reference_docs([NEGEX_SENTS], "QN")
    dico = fixture_dictionary()
    cfg = for_search_method("best-match")
    bad = 0
    for qi, s in enumerate(NEGEX_SENTS):
        mentions = process_sentence(s, dico, cfg)
        mods = NX.process(s, mentions)
        ours = set()
        for m, lst in zip(mentions, mods):
            key = tuple(sorted((t, o) for t, o in m.annotations))
            mv = tuple(sorted({f"{x.type}={x.value}" for x in lst}))
            ours.add((m.cui, key, mv))
        got = ref.get(qi, set())
        if ours != got:
            bad += 1
            print(f"NEGEX DIFF {s!r}")
            for x in sorted(got - ours):
                print("   ref-only :", x)
            for x in sorted(ours - got):
                print("   ours-only:", x)
    print(f"negex: {len(NEGEX_SENTS)} sentences, {bad} diffs"
          + ("" if bad == 0 else "  <-- FAIL"))
    return bad == 0




CONTEXT_SENTS = [
    "There is no evidence of melanoma in the margins.",
    "The melanoma is present.",
    "Skin rash is absent.",
    "Family history of breast cancer.",
    "History of diabetes.",
    "Findings suspicious for melanoma.",
    "No rash but fever is noted.",
    "No change in the melanoma.",
    "Patient denies fever and presents without rash.",
    "No evidence of skin cancer; possible dysplastic nevus.",
    "Prior melanoma was excised without difficulty.",
    "Mother had breast cancer, however the patient has asthma.",
    "No fever, no rash, no headache today.",
    "Probable hypertension; diabetes is ruled out.",
    "Negative for melanoma but positive for nevus.",
    # paragraph-action modifier (hasParagraphAction DIRECT on the concept):
    # the reference appends it to the sentence output via
    # getGlobalModifierMentions — ours must surface it identically
    "The following were not identified: melanoma, rash, fever.",
    "Negative for the following findings and nevus.",
    "Biopsy shows none of the following were seen near the margin.",
]


def _context_corpus():
    from nobletools_spark.pipeline.documents import generate_documents_local
    from nobletools_spark.sentence.splitter import (filter_sentence,
                                                    process_document)
    out = list(CONTEXT_SENTS)
    for _, spans in generate_documents_local(40, seed=77):
        for sp in spans:
            if sp["kind"] != "text" or not sp["text"]:
                continue
            rows, _ = process_document(sp["text"])
            out += [r.text.strip() for r in rows
                    if not filter_sentence(r.text, r.sent_type)
                    and r.text.strip() and "\n" not in r.text]
    return out


def _lexicon_lines():
    from nobletools_spark.context.lexicon import (LEXICON_CONCEPTS,
                                                  LEXICON_ISA_EDGES)
    parents = {}
    for child, parent in LEXICON_ISA_EDGES:
        parents.setdefault(child, []).append(parent)
    lines = []
    for c in LEXICON_CONCEPTS:
        props = dict(c.get("props", {}))
        rels = {}
        # hasTermination/hasPseudo are RELATIONS in the reference model
        for rp in ("hasTermination", "hasPseudo"):
            if rp in props:
                rels[rp] = props.pop(rp).split(",")
        for p in parents.get(c["cui"], []):
            rels.setdefault("Broader", []).append(p)  # Relation.BROADER.getName() == "Broader"
        prop_s = ";".join(f"{k}={v}" for k, v in props.items())
        rel_s = ";".join(f"{k}={'|'.join(v)}" for k, v in rels.items())
        lines.append(US.join([
            "X", c["cui"], c["name"], "|".join(c.get("synonyms", ())),
            ";".join(c.get("sem_types", ())), prop_s, rel_s]))
    return lines


def run_context_diff() -> bool:
    sys.path.insert(0, ROOT)
    from nobletools_spark.config import for_search_method
    from nobletools_spark.context.context import ConTextEngine
    from nobletools_spark.context.lexicon import modifier_dictionary
    from nobletools_spark.matcher.core import process_sentence
    from nobletools_spark.terminology.fixture import (FIXTURE_CONCEPTS,
                                                      fixture_dictionary)
    lines = []
    for c in FIXTURE_CONCEPTS:
        terms = ",".join(f"{t[0]}:{t[1]}" for t in c.get("terms", ()))
        lines.append(US.join([
            "C", c["cui"], c["name"], "|".join(c.get("synonyms", ())),
            ";".join(c.get("sem_types", ())),
            ";".join(c.get("sources", ())), terms]))
    lines += _lexicon_lines()
    sentences = _context_corpus()
    lines.append("CTX")
    lines.append(US.join(["O", "best-match"]))
    for s in sentences:
        lines.append(US.join(["QC", s]))
    proc = subprocess.run(
        ["java", "-cp", CP, "DiffMain"], cwd=SCRATCH,
        input="\n".join(lines), capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-800:])
    ref: dict[int, set] = {}
    for line in proc.stdout.splitlines():
        f = line.split(US)
        if f[0] == "M":
            qi = int(f[1])
            anns = tuple(sorted(
                (a.rsplit("@", 1)[0], int(a.rsplit("@", 1)[1]))
                for a in f[5].split(",") if a))
            mods = tuple(sorted(set(f[6].split(",")))) if len(f) > 6 and f[6] else ()
            ref.setdefault(qi, set()).add((f[2], anns, mods))
        elif f[0] == "D":
            ref.setdefault(int(f[1]), set())

    dico = fixture_dictionary()
    engine = ConTextEngine(modifier_dictionary())
    cfg = for_search_method("best-match")
    bad = 0
    for qi, s in enumerate(sentences):
        mentions = process_sentence(s, dico, cfg)
        slots, globals_ = engine.process_with_globals(s, mentions)
        ours = set()
        for m, slot in zip(mentions, slots):
            key = tuple(sorted((t, o) for t, o in m.annotations))
            mv = tuple(sorted({f"{t}={x.value}" for t, lst in slot.items()
                               for x in lst}))
            ours.add((m.cui, key, mv))
        # ConText.process:394 appends global (paragraph/section-action)
        # modifier mentions to the sentence output; mirror that
        for gm in globals_:
            key = tuple(sorted((t, o) for t, o in gm.annotations))
            ours.add((gm.cui, key, ()))
        got = ref.get(qi, set())
        if ours != got:
            bad += 1
            print(f"CONTEXT DIFF {s!r}")
            for x in sorted(got - ours):
                print("   ref-only :", x)
            for x in sorted(ours - got):
                print("   ours-only:", x)
    print(f"context: {len(sentences)} sentences, {bad} diffs"
          + ("" if bad == 0 else "  <-- FAIL"))
    return bad == 0


TERMFILTER_CASES = [
    "ADHESIVE @@ BANDAGE", "EC 2.7.1.112", "Leukemia NOS",
    "Unclassified sequences", "Other malignant neoplasm",
    "Structure of kidney", "Left kidney", "Right upper lobe",
    "Failure, Renal", "Alzheimer's disease", "Chondria <beetle>",
    "Surgical intervention (finding)", "Gluten-free foods [generic 1]",
    "Selective Serotonin Reuptake Inhibitors (SSRIs)",
    "Malignant melanoma", "Head and Neck Squamous Cell Carcinoma",
    "skin tag", "NEC", "nos", "unspecified fracture",
    "carcinoma, ductal", "mole of skin", "Entire kidney",
    "melanoma NOS", "tumor, benign", "World Health Organization (WHO)",
    "deep margin", "cancer of the skin", "miscellaneous disorders",
    "no abnormality", "breast carcinoma (disorder)",
]


def run_termfilter_diff() -> bool:
    sys.path.insert(0, ROOT)
    from nobletools_spark.terminology.termfilter import filter_term
    lines = [US.join(["TF", t]) for t in TERMFILTER_CASES]
    proc = subprocess.run(
        ["java", "-cp", CP, "DiffMain"], cwd=SCRATCH,
        input="\n".join(lines), capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-500:])
    outs = [l for l in proc.stdout.splitlines() if l.startswith("F")]
    bad = 0
    for t, line in zip(TERMFILTER_CASES, outs):
        body = line[1:]
        ref = set(x for x in body.split(US) if x != "") if body else set()
        ours = set(filter_term(t))
        if ref != ours:
            bad += 1
            print(f"TERMFILTER DIFF {t!r}: ref={sorted(ref)} ours={sorted(ours)}")
    print(f"termfilter: {len(TERMFILTER_CASES)} terms, {bad} diffs"
          + ("" if bad == 0 else "  <-- FAIL"))
    return bad == 0


def run_ancestors_diff() -> bool:
    """PathHelper.findAncestors (BFS, min-depth, limit 7) vs the same BFS
    our graph.hierarchy.ancestors_closure is pinned to in test_graph."""
    sys.path.insert(0, ROOT)
    from collections import deque
    from nobletools_spark.terminology.fixture import (FIXTURE_CONCEPTS,
                                                      FIXTURE_ISA_EDGES)
    lines = []
    for c in FIXTURE_CONCEPTS:
        terms = ",".join(f"{t[0]}:{t[1]}" for t in c.get("terms", ()))
        lines.append(US.join([
            "C", c["cui"], c["name"], "|".join(c.get("synonyms", ())),
            ";".join(c.get("sem_types", ())),
            ";".join(c.get("sources", ())), terms]))
    for child, parent in FIXTURE_ISA_EDGES:
        lines.append(US.join(["R", child, parent]))
    cuis = [c["cui"] for c in FIXTURE_CONCEPTS]
    for cui in cuis:
        lines.append(US.join(["PH", cui]))
    proc = subprocess.run(
        ["java", "-cp", CP, "DiffMain"], cwd=SCRATCH,
        input="\n".join(lines), capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-500:])
    outs = [l for l in proc.stdout.splitlines() if l.startswith("A")]

    parents: dict[str, list[str]] = {}
    for c, pnt in FIXTURE_ISA_EDGES:
        parents.setdefault(c, []).append(pnt)

    def bfs(start):
        seen = {}
        q = deque([(start, 0)])
        while q:
            node, d = q.popleft()
            if d >= 7:
                continue
            for pnt in parents.get(node, []):
                if pnt not in seen:
                    seen[pnt] = d + 1
                    q.append((pnt, d + 1))
        return seen

    bad = 0
    for cui, line in zip(cuis, outs):
        body = line[1:]
        ref = {}
        if body:
            for part in body.split(US):
                if part:
                    code, d = part.rsplit(":", 1)
                    ref[code] = int(d)
        ours = bfs(cui)
        if ref != ours:
            bad += 1
            print(f"ANCESTOR DIFF {cui}: ref={ref} ours={ours}")
    print(f"ancestors: {len(cuis)} concepts, {bad} diffs"
          + ("" if bad == 0 else "  <-- FAIL"))
    return bad == 0


PARAGRAPH_CASES = [
    # blank-line paragraphs, single-spaced text
    "First paragraph line one.\nline two continues.\n\nSecond paragraph "
    "here.\n\n\nThird one after a double gap.\n",
    # divider rules
    "Alpha block of text.\n-----\nBeta block after dashes.\n=====\n"
    "Gamma block after equals.\n",
    # PART markers (label the paragraph they close)
    "PART 1: specimen A description text.\nPART 2: specimen B "
    "description.\nPARTS 1 AND 2: combined note.\n",
    # lowercase part marker: splits (finder is case-insensitive) but must
    # NOT be labeled (Java's delim.matches(PARTS) is case-sensitive)
    "part 1: lowercase specimen text.\npart 2: second lowercase "
    "specimen.\nPART 3: uppercase closes labeled.\n",
    # double-spaced document (no single-spaced pair of >=5-char lines):
    # only >=3-newline gaps split
    "Line alpha.\n\nLine beta.\n\n\nLine gamma.\n",
    # sectioned document: paragraphs parse per section body
    ("FINAL DIAGNOSIS:  Malignant melanoma of the skin.\n\n"
     "Deep margin is clear.\n"
     "COMMENT:  The following were not identified: rash, fever.\n\n"
     "Discussed with care team.\n"),
    "   \n\n  \n",  # whitespace only -> no paragraphs
    "Single paragraph no delimiters at all",
]


def run_paragraph_diff() -> bool:
    """C5: ParagraphProcessor vs sentence/splitter.find_paragraphs —
    span + part-label equality per document."""
    sys.path.insert(0, ROOT)
    from nobletools_spark.pipeline.documents import generate_documents_local
    from nobletools_spark.sentence.splitter import (find_paragraphs,
                                                    find_sections)
    cases = list(PARAGRAPH_CASES)
    for _, spans in generate_documents_local(15, seed=99):
        text = "".join(sp["text"] for sp in spans if sp["kind"] == "text")
        if text:
            cases.append(text)

    lines = [US.join(["PP", r.replace("\n", "\\n")]) for r in cases]
    proc = subprocess.run(
        ["java", "-cp", CP, "DiffMain"], cwd=SCRATCH,
        input="\n".join(lines), capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-500:])
    outs = [l for l in proc.stdout.splitlines() if l.startswith("G")]
    bad = 0
    for text, line in zip(cases, outs):
        ref = []
        for part in line[1:].split(US):
            if part:
                st, en, lbl = part.split("|", 2)
                ref.append((int(st), int(en), lbl.replace("\\n", "\n")))
        ours = [(p.start, p.end, (p.part or "").replace("\n", "\n"))
                for p in find_paragraphs(text, find_sections(text))]
        if ref != ours:
            bad += 1
            if bad <= 3:
                print(f"PARAGRAPH DIFF {text[:60]!r}")
                print("   ref :", ref)
                print("   ours:", ours)
    print(f"paragraphs: {len(cases)} documents, {bad} diffs"
          + ("" if bad == 0 else "  <-- FAIL"))
    return bad == 0


def run_docproc_diff() -> bool:
    """DocumentProcessor (sectioning, line merge, sentence typing) vs our
    sentence/splitter.process_document on report-shaped texts."""
    sys.path.insert(0, ROOT)
    from nobletools_spark.pipeline.documents import generate_documents_local
    from nobletools_spark.sentence.splitter import process_document

    reports = [
        ("FAMILY HISTORY:  Mother had breast cancer. Father had diabetes.\n"
         "ASSESSMENT:  Patient has a skin rash today."),
        ("CHIEF COMPLAINT:  Chest pain.\nHISTORY OF PRESENT ILLNESS:  The\n"
         "patient reports fever and\nchills for 2.5 days. No rash.\n"
         "PLAN:  Follow up."),
        "Plain prose without sections. Melanoma was excised. No recurrence.",
        "LINE ONE\nLINE TWO\nline three continues\nhere as a wrap.",
        ("DIAGNOSIS:  Malignant melanoma.\n\n"
         "1. Margins clear.\n2. Depth 2.5 mm.\n"),
    ]
    # plus generated corpus documents (joined text spans)
    for _, spans in generate_documents_local(20, seed=55):
        text = "".join(sp["text"] for sp in spans if sp["kind"] == "text")
        if text:
            reports.append(text)

    lines = [US.join(["DP", r.replace("\n", "\\n")]) for r in reports]
    proc = subprocess.run(
        ["java", "-cp", CP, "DiffMain"], cwd=SCRATCH,
        input="\n".join(lines), capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-500:])
    outs = [l for l in proc.stdout.splitlines() if l.startswith("P")]
    bad = 0
    for text, line in zip(reports, outs):
        body = line[1:]
        ref = set()
        if body:
            for part in body.split(US):
                if part:
                    a, off, t = part.split("|", 2)
                    ref.add((a, int(off), t.replace("\\n", "\n")))
        rows, secs = process_document(text)
        ours = {("S", sc.title_offset, sc.title) for sc in secs}
        ours |= {(r.sent_type, r.offset, r.text) for r in rows}
        if ref != ours:
            bad += 1
            if bad <= 3:
                print(f"DOCPROC DIFF {text[:60]!r}")
                for x in sorted(ref - ours):
                    print("   ref-only :", x)
                for x in sorted(ours - ref):
                    print("   ours-only:", x)
    print(f"docproc: {len(reports)} documents, {bad} diffs"
          + ("" if bad == 0 else "  <-- FAIL"))
    return bad == 0


if __name__ == "__main__":
    sys.exit(main())
