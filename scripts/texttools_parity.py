"""Differential parity check: our text layer vs the reference TextTools.

Compiles the reference's TextTools.java + Stemmer.java +
SentenceDetector.java (JDK-only deps; the three unrelated members touching
FileTools/Sender are stubbed, Sentence replaced with a 10-line API stub)
into .scratch/texttools and diffs getWords / normalizeWords / normalize /
sentence splitting over ~5k inputs: every fixture synonym, generated
corpus sentences, hand-picked edge cases (floats, diacritics, possessives,
acronyms, delimiter soup), and 4k random strings.

Last recorded run: 0 mismatches on all four functions over 5,154 inputs.

Usage: python scripts/texttools_parity.py   (skips if no javac/reference)
"""

from __future__ import annotations

import os
import random
import shutil
import string
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(ROOT, ".scratch", "texttools")
REF = "/root/reference/src/main/java/edu/pitt/dbmi/nlp/noble/tools"
REF_RES = "/root/reference/src/main/resources/resources"

MAIN_JAVA = r'''
import edu.pitt.dbmi.nlp.noble.tools.TextTools;
import edu.pitt.dbmi.nlp.noble.tools.SentenceDetector;
import edu.pitt.dbmi.nlp.noble.coder.model.Sentence;
import java.io.*;
import java.util.*;
public class Main {
    public static void main(String[] args) throws Exception {
        BufferedReader r = new BufferedReader(new InputStreamReader(System.in, "UTF-8"));
        PrintWriter w = new PrintWriter(new OutputStreamWriter(System.out, "UTF-8"));
        String us = "\u001f";
        String line;
        while ((line = r.readLine()) != null) {
            String text = line.replace("\\n", "\n").replace("\\t", "\t");
            w.println("W" + us + String.join(us, TextTools.getWords(text)));
            w.println("N" + us + String.join(us, TextTools.normalizeWords(text, true, false, true)));
            w.println("S" + us + TextTools.normalize(text, true, false, true, true, false));
            StringBuilder b = new StringBuilder("T");
            for (Sentence sn : SentenceDetector.getSentences(text, 0)) {
                b.append(us).append(sn.getOffset()).append("|")
                 .append(sn.getText().replace("\n", "\\n"));
            }
            w.println(b.toString());
        }
        w.flush();
    }
}
'''

# minimal stand-in for the model class SentenceDetector instantiates —
# API surface only (text/offset/type), no reference code
SENTENCE_STUB = r'''
package edu.pitt.dbmi.nlp.noble.coder.model;
public class Sentence {
    public static final String TYPE_PROSE = "Prose";
    private String text; private int offset; private String type;
    public Sentence(String t, int o, String ty) { text = t; offset = o; type = ty; }
    public String getText() { return text; }
    public int getOffset() { return offset; }
}
'''

STUBS = [
    ("import edu.pitt.dbmi.nlp.noble.util.FileTools;", ""),
    ("import edu.pitt.dbmi.nlp.noble.util.Sender;", ""),
    ("private Sender sender;", "private Object sender;"),
    ("sender = new Sender(servlet);",
     "throw new UnsupportedOperationException();"),
    ("sender = new Sender(new URL(DEFAULT_TEXT_TOOLS_URL));",
     "throw new UnsupportedOperationException();"),
    ("return FileTools.getText(in, lineSeparator);",
     "throw new UnsupportedOperationException();"),
    ("return SentenceDetector.getSentences(txt);",
     "throw new UnsupportedOperationException();"),
]


def build() -> bool:
    if not shutil.which("javac") or not os.path.isdir(REF):
        return False
    pkg = os.path.join(SCRATCH, "edu/pitt/dbmi/nlp/noble/tools")
    model = os.path.join(SCRATCH, "edu/pitt/dbmi/nlp/noble/coder/model")
    os.makedirs(pkg, exist_ok=True)
    os.makedirs(model, exist_ok=True)
    os.makedirs(os.path.join(SCRATCH, "resources"), exist_ok=True)
    for f in ("TextTools.java", "Stemmer.java", "SentenceDetector.java"):
        shutil.copy(os.path.join(REF, f), pkg)
    with open(os.path.join(model, "Sentence.java"), "w") as f:
        f.write(SENTENCE_STUB)
    with open(os.path.join(pkg, "TextTools.java")) as f:
        src = f.read()
    for old, new in STUBS:
        src = src.replace(old, new)
    with open(os.path.join(pkg, "TextTools.java"), "w") as f:
        f.write(src)
    for f in os.listdir(REF_RES):
        if f.endswith(".lst"):
            shutil.copy(os.path.join(REF_RES, f),
                        os.path.join(SCRATCH, "resources"))
    with open(os.path.join(SCRATCH, "Main.java"), "w") as f:
        f.write(MAIN_JAVA)
    r = subprocess.run(["javac", "-encoding", "UTF-8", "-cp", ".",
                        "Main.java"], cwd=SCRATCH, capture_output=True)
    return r.returncode == 0


def corpus() -> list[str]:
    sys.path.insert(0, ROOT)
    from nobletools_spark.pipeline.documents import generate_documents_local
    from nobletools_spark.terminology.fixture import FIXTURE_CONCEPTS
    inputs: list[str] = []
    for c in FIXTURE_CONCEPTS:
        inputs.append(c["name"])
        inputs.extend(c["synonyms"])
    for _, spans in generate_documents_local(120, seed=99):
        for s in spans:
            if s["kind"] == "text":
                inputs.append(s["text"].strip())
    inputs += ["", "a", "A.", ".A", "2.5 mg", "Protégé", "naïve café",
               "IL-2", "p53", "x/y|z", "(foo) [bar]", "don't", "Alzheimer's",
               "2.5.3", "a.0", "U.S.A.", "e.g. test", "Dr. Smith",
               "HELLO WORLD", "CamelCase", "semi;colon", "tab\ttab",
               "  spaces  ", "-dash-", "–en—em",
               "ÀàÈèÌì ÁáÉé ÂâÊê ÃãÕõ ÄäËë Åå Çç Őő"]
    rng = random.Random(7)
    al = string.ascii_letters + string.digits + " .,;:-()'/\"<>[]|\\_~^!?"
    inputs += ["".join(rng.choice(al) for _ in range(rng.randint(1, 60)))
               for _ in range(4000)]
    return [i.replace("\n", "\\n").replace("\t", "\\t")
            for i in inputs if "\r" not in i]


def main() -> int:
    if not build():
        print("SKIP: javac or reference sources unavailable")
        return 0
    sys.path.insert(0, ROOT)
    from nobletools_spark.text import tools as T
    inputs = corpus()
    proc = subprocess.run(["java", "-cp", ".", "Main"], cwd=SCRATCH,
                          input="\n".join(inputs), capture_output=True,
                          text=True, timeout=300)
    if proc.returncode != 0:
        print("oracle failed:", proc.stderr[:500])
        return 1
    lines = proc.stdout.splitlines()
    US = "\x1f"

    def parse(line: str) -> list[str]:
        body = line[2:]
        return body.split(US) if body != "" else [""]

    bad = 0
    for i, text in enumerate(inputs):
        raw = text.replace("\\n", "\n").replace("\\t", "\t")
        jw, jn = parse(lines[4 * i]), parse(lines[4 * i + 1])
        js = lines[4 * i + 2][2:]
        pw = T.get_words(raw)
        pn = T.normalize_words(raw, True, False, True)
        ps = T.normalize(raw, True, False, True, unique_words=True,
                         sort_words=False)
        for name, j, p in (("getWords", jw, pw), ("normalizeWords", jn, pn)):
            if j != p and not (j == [""] and p == []):
                print(f"MISMATCH {name} {raw!r}: java={j} py={p}")
                bad += 1
        if js != ps:
            print(f"MISMATCH normalize {raw!r}: java={js!r} py={ps!r}")
            bad += 1
        # sentence splitter (offset variant, ';' terminator)
        from nobletools_spark.sentence.splitter import split_prose
        jt = lines[4 * i + 3][2:]
        jsents = []
        if jt:
            for part in jt.split(US):
                off, txt2 = part.split("|", 1)
                jsents.append((txt2.replace("\\n", "\n"), int(off)))
        psents = split_prose(raw, 0)
        if jsents != psents:
            print(f"MISMATCH sentences {raw!r}: java={jsents} py={psents}")
            bad += 1
    print(f"{len(inputs)} inputs, {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
