"""Easylist-subset adblock data table (rules only, no engine).

The reference filters sub-resource lists through braveblock loaded
with full easylist + easyprivacy (html_metadata.py:542-560 in
bnewbold/sandcrawler). braveblock is not installable in this sandbox,
so the filtering engine stays the simple host-suffix + substring
matcher in biblio.adblock_check_py; THIS module is the data: a
transcribed subset of easylist's public domain-anchor rules
(||domain^ entries) covering the ad/analytics/tracker hosts that
actually occur on publisher and general web pages, plus a small set
of easylist generic path anchors.

Selection principle: every entry is a well-known third-party
advertising / analytics / session-replay / social-tracking host whose
easylist(-privacy) listing is stable across years — no publisher
first-party CDNs, no generic words that could shadow article
sub-resources. Substring rules are kept conservative (path anchors
that easylist itself anchors with '/', e.g. '/pagead/') to avoid
false-positive drops of legitimate resources.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# ||domain^ anchors (match the host itself or any subdomain)
# ---------------------------------------------------------------------------
EASYLIST_DOMAIN_ANCHORS: tuple[str, ...] = (
    # ad exchanges / SSPs / DSPs
    "doubleclick.net", "googlesyndication.com", "googleadservices.com",
    "adnxs.com", "adsrvr.org", "criteo.com", "criteo.net",
    "pubmatic.com", "rubiconproject.com", "magnite.com", "openx.net",
    "indexww.com", "casalemedia.com", "smartadserver.com",
    "adsafeprotected.com", "moatads.com", "doubleverify.com",
    "amazon-adsystem.com", "adtechus.com", "advertising.com",
    "yieldmo.com", "sharethrough.com", "triplelift.com", "teads.tv",
    "spotxchange.com", "spotx.tv", "freewheel.tv", "innovid.com",
    "undertone.com", "sonobi.com", "gumgum.com", "33across.com",
    "lijit.com", "sovrn.com", "bidswitch.net", "mathtag.com",
    "turn.com", "mediamath.com", "simpli.fi", "zemanta.com",
    # content-recommendation ("chumbox") networks
    "taboola.com", "outbrain.com", "revcontent.com", "mgid.com",
    "zergnet.com", "content.ad",
    # analytics / measurement
    "google-analytics.com", "googletagmanager.com", "googletagservices.com",
    "scorecardresearch.com", "quantserve.com", "quantcount.com",
    "chartbeat.com", "chartbeat.net", "parsely.com", "parse.ly",
    "newrelic.com", "nr-data.net", "mixpanel.com", "segment.com",
    "segment.io", "amplitude.com", "heapanalytics.com", "kissmetrics.com",
    "matomo.cloud", "statcounter.com", "clicky.com", "gosquared.com",
    "alexametrics.com", "comscore.com", "nielsen.com", "imrworldwide.com",
    # session replay / heatmaps
    "hotjar.com", "fullstory.com", "mouseflow.com", "crazyegg.com",
    "clicktale.net", "inspectlet.com", "luckyorange.com", "smartlook.com",
    "logrocket.com", "sessioncam.com",
    # data brokers / DMPs / identity
    "krxd.net", "bluekai.com", "demdex.net", "omtrdc.net",
    "everesttech.net", "exelator.com", "eyeota.net", "tapad.com",
    "liveramp.com", "rlcdn.com", "id5-sync.com", "adsymptotic.com",
    "agkn.com", "crwdcntrl.net", "narrative.io",
    # social widgets / share-tracking
    "connect.facebook.net", "addthis.com",
    "addtoany.com", "sharethis.com", "po.st",
    "ads-twitter.com", "ads.linkedin.com", "px.ads.linkedin.com",
    # push / engagement / popups
    "onesignal.com", "pushcrew.com", "pushengage.com", "izooto.com",
    "optinmonster.com", "sumo.com", "sumome.com",
    # A/B & personalization trackers
    "optimizely.com", "vwo.com", "visualwebsiteoptimizer.com",
    "abtasty.com", "kameleoon.com",
    # regional majors
    "mc.yandex.ru", "an.yandex.ru", "hm.baidu.com", "cnzz.com",
    "umeng.com", "growingio.com",
    # misc long-standing easylist entries
    "zedo.com", "adform.net", "adition.com", "bidr.io",
    "serving-sys.com", "sizmek.com", "flashtalking.com",
    "tribalfusion.com", "exponential.com", "contextweb.com",
    "districtm.io", "gemius.pl", "hit.gemius.pl",
)

# ---------------------------------------------------------------------------
# generic path anchors (easylist's '/…/' rules; conservative subset)
# ---------------------------------------------------------------------------
EASYLIST_PATH_ANCHORS: tuple[str, ...] = (
    "/pagead/", "/adsbygoogle.", "/adserver/", "/adsense/",
    "/openx/www/delivery/", "/ads/banner", "/banners/ad",
    "/wp-content/plugins/quick-adsense", "/adx/", "/doubleclick/",
    "facebook.com/tr?", "facebook.com/tr/",  # FB pixel endpoint
)
