"""Golden tests for the canned parse_* family — inputs/outputs lifted from
the reference's executable doc examples
(website/cue/reference/remap/functions/parse_*.cue), the same corpus the
reference runs as tests (lib/vector-vrl/tests/src/docs.rs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.functions import parsers as P


def _one(spark, line, cols):
    df = spark.createDataFrame([(line,)], ["m"])
    return df.select(*cols).collect()[0].asDict()


NGINX_COMBINED_LINE = (
    '172.17.0.1 - alice [01/Apr/2021:12:02:31 +0000] "POST /not-found HTTP/1.1" '
    '404 153 "http://localhost/somewhere" "Mozilla/5.0 (Windows NT 6.1) '
    'AppleWebKit/537.36 (KHTML, like Gecko) Chrome/72.0.3626.119 Safari/537.36" "2.75"'
)


def test_parse_nginx_combined(spark):
    got = _one(spark, NGINX_COMBINED_LINE, P.parse_nginx_log("m", "combined"))
    assert got["client"] == "172.17.0.1"
    assert got["user"] == "alice"
    assert got["timestamp"] == "01/Apr/2021:12:02:31 +0000"
    assert (got["method"], got["path"], got["protocol"]) == ("POST", "/not-found", "HTTP/1.1")
    assert (got["status"], got["size"]) == (404, 153)
    assert got["referer"] == "http://localhost/somewhere"
    assert got["agent"].startswith("Mozilla/5.0 (Windows NT 6.1)")
    assert got["compression"] == "2.75"


def test_parse_nginx_combined_dash_fields(spark):
    line = '127.0.0.1 - - [01/Apr/2021:12:02:31 +0000] "GET / HTTP/1.1" 200 5 "-" "-"'
    got = _one(spark, line, P.parse_nginx_log("m", "combined"))
    assert got["user"] is None and got["referer"] is None and got["agent"] is None
    assert got["compression"] is None  # absent optional field


NGINX_ERROR_LINE = (
    '2021/04/01 13:02:31 [error] 31#31: *1 open() "/usr/share/nginx/html/not-found" '
    "failed (2: No such file or directory), client: 172.17.0.1, server: localhost, "
    'request: "POST /not-found HTTP/1.1", host: "localhost:8081"'
)


def test_parse_nginx_error(spark):
    got = _one(spark, NGINX_ERROR_LINE, P.parse_nginx_log("m", "error"))
    assert got["timestamp"] == "2021/04/01 13:02:31"
    assert got["severity"] == "error"
    assert (got["pid"], got["tid"], got["cid"]) == (31, 31, 1)
    assert got["message"] == (
        'open() "/usr/share/nginx/html/not-found" failed (2: No such file or directory)'
    )
    assert got["client"] == "172.17.0.1"
    assert got["server"] == "localhost"
    assert got["request"] == "POST /not-found HTTP/1.1"
    assert got["host"] == "localhost:8081"


def test_parse_glog(spark):
    # parse_glog.cue example
    got = _one(
        spark,
        "I20210131 14:48:54.411655 15520 main.c++:9] Hello world!",
        P.parse_glog("m"),
    )
    assert got["level"] == "info"
    assert str(got["timestamp"]) == "2021-01-31 14:48:54.411655"
    assert got["id"] == 15520
    assert (got["file"], got["line"]) == ("main.c++", 9)
    assert got["message"] == "Hello world!"


def test_parse_klog(spark):
    # parse_klog.cue example (year supplied: the doc assumes current year 2023)
    got = _one(
        spark,
        "I0505 17:59:40.692994   28133 klog.go:70] hello from klog",
        P.parse_klog("m", default_year=2023),
    )
    assert got["level"] == "info"
    assert str(got["timestamp"]) == "2023-05-05 17:59:40.692994"
    assert got["id"] == 28133
    assert (got["file"], got["line"]) == ("klog.go", 70)
    assert got["message"] == "hello from klog"


def test_parse_linux_authorization(spark):
    got = _one(
        spark,
        "Mar 23 01:49:58 localhost sshd[1111]: Accepted publickey for eng from "
        "10.1.1.1 port 8888 ssh2: RSA SHA256:foobar",
        P.parse_linux_authorization("m", year=2023),
    )
    assert str(got["timestamp"]) == "2023-03-23 01:49:58"
    assert got["hostname"] == "localhost"
    assert got["appname"] == "sshd"
    assert got["procid"] == 1111
    assert got["message"].startswith("Accepted publickey for eng")


def test_parse_vpc_flow_default(spark):
    # parse_aws_vpc_flow_log.cue example 1
    line = (
        "2 123456789010 eni-1235b8ca123456789 - - - - - - - "
        "1431280876 1431280934 - NODATA"
    )
    got = _one(spark, line, P.parse_aws_vpc_flow_log("m"))
    assert got["version"] == 2
    assert got["account_id"] == 123456789010
    assert got["interface_id"] == "eni-1235b8ca123456789"
    for f in ("srcaddr", "dstaddr", "srcport", "dstport", "protocol", "packets",
              "bytes", "action"):
        assert got[f] is None, f
    assert (got["start"], got["end"]) == (1431280876, 1431280934)
    assert got["log_status"] == "NODATA"


def test_parse_vpc_flow_custom_format(spark):
    # parse_aws_vpc_flow_log.cue example 2
    line = "- eni-1235b8ca123456789 10.0.1.5 10.0.0.220 10.0.1.5 203.0.113.5"
    got = _one(
        spark, line,
        P.parse_aws_vpc_flow_log(
            "m", "instance_id interface_id srcaddr dstaddr pkt_srcaddr pkt_dstaddr"
        ),
    )
    assert got["instance_id"] is None
    assert got["interface_id"] == "eni-1235b8ca123456789"
    assert got["pkt_dstaddr"] == "203.0.113.5"


ALB_LINE = (
    "http 2018-11-30T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 "
    "192.168.131.39:2817 - 0.000 0.001 0.000 200 200 34 366 "
    '"GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" - - '
    "arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 "
    '"Root=1-58337364-23a8c76965a2ef7629b185e3" "-" "-" 0 '
    '2018-11-30T22:22:48.364000Z "forward" "-" "-" "-" "-" "-" "-"'
)


def test_parse_aws_alb_log(spark):
    got = _one(spark, ALB_LINE, P.parse_aws_alb_log("m"))
    assert got["type"] == "http"
    assert got["timestamp"] == "2018-11-30T22:23:00.186641Z"
    assert got["elb"] == "app/my-loadbalancer/50dc6c495c0c9188"
    assert got["client_host"] == "192.168.131.39:2817"
    assert got["target_host"] is None
    assert got["request_processing_time"] == 0.0
    assert got["target_processing_time"] == 0.001
    assert got["elb_status_code"] == "200"
    assert (got["received_bytes"], got["sent_bytes"]) == (34, 366)
    assert got["request_method"] == "GET"
    assert got["request_url"] == "http://www.example.com:80/"
    assert got["request_protocol"] == "HTTP/1.1"
    assert got["user_agent"] == "curl/7.46.0"
    assert got["ssl_cipher"] is None and got["ssl_protocol"] is None
    assert got["trace_id"] == "Root=1-58337364-23a8c76965a2ef7629b185e3"
    assert got["matched_rule_priority"] == "0"
    assert got["request_creation_time"] == "2018-11-30T22:22:48.364000Z"
    assert got["actions_executed"] == "forward"
    assert got["redirect_url"] is None and got["error_reason"] is None
    assert got["target_port_list"] == [] and got["target_status_code_list"] == []
    assert got["classification"] is None and got["classification_reason"] is None


CEF_PTA = (
    "CEF:0|CyberArk|PTA|12.6|1|Suspected credentials theft|8|"
    "suser=mike2@prod1.domain.com shost=prod1.domain.com src=1.1.1.1 "
    "duser=andy@dev1.domain.com dhost=dev1.domain.com dst=2.2.2.2 "
    "cs1Label=ExtraData cs1=None cs2Label=EventID cs2=52b06812ec3500ed864c461e "
    "deviceCustomDate1Label=detectionDate deviceCustomDate1=1388577900000 "
    "cs3Label=PTAlink cs3=https://1.1.1.1/incidents/52b06812ec3500ed864c461e "
    "cs4Label=ExternalLink cs4=None"
)


def test_parse_cef(spark):
    got = _one(spark, CEF_PTA, P.parse_cef("m"))
    assert got["cefVersion"] == "0"
    assert got["deviceVendor"] == "CyberArk"
    assert got["deviceProduct"] == "PTA"
    assert got["deviceVersion"] == "12.6"
    assert got["deviceEventClassId"] == "1"
    assert got["name"] == "Suspected credentials theft"
    assert got["severity"] == "8"
    ext = got["extension"]
    assert ext["suser"] == "mike2@prod1.domain.com"
    assert ext["src"] == "1.1.1.1"
    assert ext["cs2"] == "52b06812ec3500ed864c461e"
    assert ext["deviceCustomDate1"] == "1388577900000"
    assert ext["cs3"] == "https://1.1.1.1/incidents/52b06812ec3500ed864c461e"


def test_parse_cef_syslog_prefix(spark):
    # cue example 2: "Ignores everything up to CEF header"
    line = (
        "Sep 29 08:26:10 host CEF:1|Security|threatmanager|1.0|100|"
        "worm successfully stopped|10|src=10.0.0.1 dst=2.1.2.2 spt=1232"
    )
    got = _one(spark, line, P.parse_cef("m"))
    assert got["cefVersion"] == "1"
    assert got["deviceVendor"] == "Security"
    assert got["name"] == "worm successfully stopped"
    assert got["extension"] == {"src": "10.0.0.1", "dst": "2.1.2.2", "spt": "1232"}


def test_parse_cef_translate_custom_fields(spark):
    # cue example 3
    line = (
        "CEF:0|Dev|firewall|2.2|1|Connection denied|5|"
        "c6a1=2345:0425:2CA1:0000:0000:0567:5673:23b5 c6a1Label=Device IPv6 Address"
    )
    got = _one(spark, line, P.parse_cef("m", translate_custom_fields=True))
    assert got["extension"] == {
        "Device IPv6 Address": "2345:0425:2CA1:0000:0000:0567:5673:23b5"
    }


def test_parse_user_agent_fast(spark):
    # parse_user_agent.cue example 1 (fast mode)
    ua = (
        "Mozilla Firefox 1.0.1 Mozilla/5.0 (X11; U; Linux i686; de-DE; rv:1.7.6) "
        "Gecko/20050223 Firefox/1.0.1"
    )
    got = _one(spark, ua, [P.parse_user_agent("m").alias("ua")])["ua"].asDict(True)
    assert got["browser"] == {"family": "Firefox", "version": "1.0.1"}
    assert got["device"] == {"category": "pc"}
    assert got["os"] == {"family": "Linux", "version": None}


def test_parse_user_agent_reliable(spark):
    # parse_user_agent.cue example 2 (reliable mode)
    ua = "Mozilla/4.0 (compatible; MSIE 7.66; Windows NT 5.1; SV1; .NET CLR 1.1.4322)"
    got = _one(
        spark, ua, [P.parse_user_agent("m", mode="reliable").alias("ua")]
    )["ua"].asDict(True)
    assert got["browser"] == {"family": "Internet Explorer", "version": "7.66"}
    assert got["device"] == {"category": "pc"}
    assert got["os"] == {"family": "Windows XP", "version": "NT 5.1"}


def test_parse_user_agent_enriched(spark):
    # parse_user_agent.cue example 3 (enriched mode)
    ua = (
        "Opera/9.80 (J2ME/MIDP; Opera Mini/4.3.24214; iPhone; CPU iPhone OS "
        "4_2_1 like Mac OS X; AppleWebKit/24.783; U; en) Presto/2.5.25 Version/10.54"
    )
    got = _one(
        spark, ua, [P.parse_user_agent("m", mode="enriched").alias("ua")]
    )["ua"].asDict(True)
    assert got["browser"] == {
        "family": "Opera Mini",
        "major": "4",
        "minor": "3",
        "patch": "24214",
        "version": "10.54",
    }
    assert got["device"] == {
        "brand": "Apple",
        "category": "smartphone",
        "family": "iPhone",
        "model": "iPhone",
    }
    assert got["os"] == {
        "family": "iOS",
        "major": "4",
        "minor": "2",
        "patch": "1",
        "patch_minor": None,
        "version": "4.2.1",
    }


def test_parse_ruby_hash(spark):
    # parse_ruby_hash.cue example
    line = '{ "test" => "value", "testNum" => 0.2, "testObj" => { "testBool" => true, "testNull" => nil } }'
    got = _one(
        spark, line,
        [P.parse_ruby_hash(
            "m", "test string, testNum double, testObj struct<testBool boolean, testNull string>"
        ).alias("h")],
    )["h"].asDict(True)
    assert got["test"] == "value"
    assert got["testNum"] == 0.2
    assert got["testObj"] == {"testBool": True, "testNull": None}


def test_parse_xml(spark):
    # parse_xml.cue example (root element maps to the struct itself —
    # documented delta vs the single-key wrapper object)
    xml = (
        '<book category="CHILDREN"><title lang="en">Harry Potter</title>'
        "<author>J K. Rowling</author><year>2005</year></book>"
    )
    got = _one(
        spark, xml,
        [P.parse_xml(
            "m",
            "`@category` string, title struct<`@lang` string, value string>, "
            "author string, year string",
        ).alias("x")],
    )["x"].asDict(True)
    assert got["@category"] == "CHILDREN"
    assert got["title"] == {"@lang": "en", "value": "Harry Potter"}
    assert got["author"] == "J K. Rowling"
    assert got["year"] == "2005"


def test_parse_cloudwatch_subscription(spark):
    msg = (
        '{"messageType": "DATA_MESSAGE", "owner": "111111111111", "logGroup": "test",'
        ' "logStream": "test", "subscriptionFilters": ["Destination"],'
        ' "logEvents": [{"id": "3568", "timestamp": 1600110569039, "message": "hi"}]}'
    )
    got = _one(
        spark, msg,
        [P.parse_aws_cloudwatch_log_subscription_message("m").alias("c")],
    )["c"].asDict(True)
    assert got["message_type"] == "DATA_MESSAGE"
    assert got["owner"] == "111111111111"
    assert got["log_group"] == "test" and got["log_stream"] == "test"
    assert got["subscription_filters"] == ["Destination"]
    assert got["log_events"] == [{"id": "3568", "timestamp": 1600110569039, "message": "hi"}]


def test_nonmatching_line_all_null(spark):
    got = _one(spark, "not a log line at all", P.parse_nginx_log("m", "combined"))
    assert all(v is None for v in got.values())
