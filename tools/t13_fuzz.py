"""Randomized equivalence fuzz for the t13 recursive-CTE oracle
(round 17): generates adversarial mini-corpora (tiny alphabets that
force aaa-run fuse edges and count ties, repeated words, CJK and
accented codepoints, null/whitespace docs) and checks the SHIPPED
oracle SQL (dumped by Verify into <outDir>/oracle_sql.json) against a
sequential reference implementation of the engine's exact BPE
algorithm. 120 seeded trials; run after any t13/oracle change:

    python3 tools/t13_fuzz.py /tmp/verify_out
"""
import duckdb, re, random, sys, json, os

def engine_ref(texts, n_merges=12, max_words=50000):
    freq = {}
    for t in texts:
        if t is None: continue
        # strip(' ') mirrors Spark/DuckDB trim() (SPACE only — python's
        # bare strip() also eats \x1c-\x1f, which the engine keeps)
        for w in re.split(r'[ \t\n\x0b\f\r]+', t.strip(' ').lower()):
            if w: freq[w] = freq.get(w, 0) + 1
    vocab = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    words = [([c for c in w], wc) for w, wc in vocab]
    def adj(s): return [(s[i], s[i+1]) for i in range(len(s)-1)]
    counts = {}
    for s, wc in words:
        for p in adj(s): counts[p] = counts.get(p, 0) + wc
    merges = []
    for rank in range(1, n_merges+1):
        counts = {k: v for k, v in counts.items() if v > 0}
        if not counts: break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, c))
        for wi, (s, wc) in enumerate(words):
            if (a, b) not in adj(s): continue
            old = adj(s)
            ns, i = [], 0
            while i < len(s):
                if i+1 < len(s) and s[i] == a and s[i+1] == b:
                    ns.append(a+b); i += 2
                else:
                    ns.append(s[i]); i += 1
            for p in old: counts[p] = counts.get(p, 0) - wc
            for p in adj(ns): counts[p] = counts.get(p, 0) + wc
            words[wi] = (ns, wc)
    return merges

out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_r17'
SQL = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))['t13_bpe_merges']

random.seed(4217)
fails = 0
for trial in range(120):
    # adversarial shapes: tiny alphabets (forces aaa-run fuse edges and
    # count ties), repeated words, empty/whitespace docs, multi-char
    # runs, unicode incl. CJK. ADVICE r17 #2: separators cover the
    # full Java-\s class (\x0b vertical tab, \f, \r\n — the RE2-\s
    # mismatch the round-18 oracle class fix closed), and alphabets
    # occasionally include chr(31) — the oracle's symbol sentinel,
    # which the hex-armored encoding must survive inside tokens.
    alpha = random.choice(['ab', 'abc', 'a', 'xyz', 'ab1', '日本語', 'aá',
                           'a\x1f', '\x1fb'])
    docs = []
    for d in range(random.randint(1, 12)):
        n = random.randint(0, 9)
        words = []
        for _ in range(n):
            L = random.randint(1, 7)
            words.append(''.join(random.choice(alpha) for _ in range(L)))
        sep = random.choice(['  ', ' ', '\t', '\x0b', '\f', '\r\n'])
        docs.append(sep.join(words)
                    + random.choice(['', ' ', '\t', '\x0b', '\f']))
    if random.random() < 0.15: docs.append(None)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in docs])
    ref = engine_ref(docs)
    got = [tuple(r) for r in con.execute(SQL).fetchall()]
    if got != ref:
        fails += 1
        print(f"TRIAL {trial} MISMATCH alpha={alpha!r}")
        print(" docs:", docs)
        print(" ref:", ref)
        print(" got:", got)
        if fails >= 3: break
print("FUZZ:", "ALL PASS (120 trials)" if fails == 0 else f"{fails} FAILURES")
