"""Vendored Public Suffix List snapshot, standard publicsuffix.org file
format (https://publicsuffix.org/list/ — PSL data is MPL-2.0, maintained
by the Mozilla Foundation; entries below are a SUBSET of the public list
reproduced with attribution).

Kept as an in-package string so the spark-submit ``--py-files`` zip
(which ships only ``.py`` files, tests/test_submit.py) carries it to the
executors. A deployment swaps in the complete current list by passing
``path=/path/to/public_suffix_list.dat`` to :func:`crawlspark.psl.load_psl`
— the parser reads the real file format, and the matcher is
list-size-independent (per-depth broadcast joins).

The snapshot is a strict superset of ``urltools.PSL_SUBSET_2/3`` (the
zero-join literal-IN fast path), plus the rule SHAPES the subset cannot
express: wildcard rules (``*.ck``), exception rules (``!www.ck``), and
multi-label wildcards (``*.kawasaki.jp`` with ``!city.kawasaki.jp``).
"""

PSL_SNAPSHOT = """\
// Public Suffix List snapshot (subset) — publicsuffix.org, MPL-2.0.
// ===BEGIN ICANN DOMAINS===
com
net
org
io
app
dev
uk
co.uk
org.uk
ac.uk
gov.uk
me.uk
ltd.uk
plc.uk
net.uk
sch.uk
jp
co.jp
ne.jp
or.jp
ac.jp
ad.jp
ed.jp
go.jp
gr.jp
lg.jp
// Japanese geographic prefecture/city second-level registrations
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
au
com.au
net.au
org.au
edu.au
gov.au
id.au
asn.au
nz
co.nz
net.nz
org.nz
ac.nz
govt.nz
kr
co.kr
or.kr
ne.kr
re.kr
go.kr
ac.kr
br
com.br
net.br
org.br
gov.br
edu.br
in
co.in
net.in
org.in
firm.in
gen.in
ind.in
cn
com.cn
net.cn
org.cn
gov.cn
edu.cn
tw
com.tw
org.tw
net.tw
edu.tw
gov.tw
mx
com.mx
org.mx
net.mx
gob.mx
edu.mx
za
co.za
org.za
net.za
web.za
gov.za
ar
com.ar
tr
com.tr
sg
com.sg
hk
com.hk
my
com.my
id
co.id
th
co.th
// wildcard-only TLDs
ck
*.ck
!www.ck
bd
*.bd
er
*.er
fk
*.fk
kh
*.kh
mm
*.mm
np
*.np
pg
*.pg
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
gitlab.io
blogspot.com
blogspot.co.uk
herokuapp.com
cloudfront.net
appspot.com
netlify.app
vercel.app
web.app
pages.dev
workers.dev
wordpress.com
s3.amazonaws.com
s3.dualstack.us-east-1.amazonaws.com
// ===END PRIVATE DOMAINS===
"""
